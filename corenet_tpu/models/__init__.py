from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig  # noqa: F401
from corenet_tpu.models import losses  # noqa: F401
