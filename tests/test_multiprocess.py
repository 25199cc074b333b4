"""Multi-process (multi-host-shaped) tests: two real JAX processes over the
distributed coordinator exercise the cross-host reduction and barrier
paths (the reference only ever tested multi-GPU manually — SURVEY §4)."""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import sys, os
    os.environ["PYTHONPATH"] = ""
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address="127.0.0.1:%d",
                               num_processes=2, process_id=pid)
    sys.path.insert(0, %r)
    import numpy as np
    from corenet_tpu.eval.results import QuantitativeResults
    q = QuantitativeResults(["__void__", "a"], "FG_BG")
    q.confusion += np.array([[1, 2], [3, 4]]) * (pid + 1)
    q.reduce_across_hosts()
    assert (q.confusion == np.array([[3, 6], [9, 12]])).all(), q.confusion
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("done")
    print(f"proc {pid} ok", flush=True)
""")


@pytest.mark.slow
def test_two_process_confusion_reduce(tmp_path):
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  port = 19741
  script = tmp_path / "worker.py"
  script.write_text(_WORKER % (port, repo))
  env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
  env.pop("XLA_FLAGS", None)
  procs = [subprocess.Popen([sys.executable, str(script), str(i)], env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)
           for i in range(2)]
  outs = [p.communicate(timeout=120)[0].decode() for p in procs]
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"proc {i} failed:\n{out}"
    assert f"proc {i} ok" in out
