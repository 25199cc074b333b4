"""Every module in the package must import cleanly.

cli/launch.py shipped with a dataclass-field-order bug that made the
module unimportable — nothing caught it because no test imported it.
This walks the whole package so latent import-time errors (bad field
orders, typos in rarely-used tools, missing deps) surface immediately.
"""

import importlib
import pkgutil

import pytest

import corenet_tpu


def _all_modules():
  mods = []
  for info in pkgutil.walk_packages(corenet_tpu.__path__,
                                    prefix="corenet_tpu."):
    mods.append(info.name)
  return sorted(mods)


@pytest.mark.parametrize("name", _all_modules())
def test_module_imports(name):
  importlib.import_module(name)
