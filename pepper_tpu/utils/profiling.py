"""Stage tracing (SURVEY.md §5.1 aux parity).

The reference's observability is timestamped stderr logging with elapsed
times per stage; this module keeps that contract and adds an opt-in XLA
profile: set PEPPER_TPU_PROFILE=/path/dir to capture a jax.profiler trace
around device stages (view with TensorBoard or xprof).
"""
import contextlib
import os
import sys
import time
from datetime import datetime


@contextlib.contextmanager
def stage(name: str):
    """Log a stage's wall time; capture an XLA trace when requested."""
    profile_dir = os.environ.get("PEPPER_TPU_PROFILE")
    t0 = time.time()
    if profile_dir:
        import jax
        with jax.profiler.trace(os.path.join(profile_dir, name)):
            yield
    else:
        yield
    sys.stderr.write(
        "[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
        + f"] INFO: STAGE {name} TOOK {time.time() - t0:.2f}s\n")
    sys.stderr.flush()
