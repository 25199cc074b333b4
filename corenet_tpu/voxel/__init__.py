from corenet_tpu.voxel.fill import fill_inside_voxels  # noqa: F401
from corenet_tpu.voxel.voxelize import (  # noqa: F401
    get_sub_grid_centers,
    voxelize_mesh,
    voxelize_triangles,
)
from corenet_tpu.voxel.compose import compose_batch_grid  # noqa: F401
