"""Build the native host-ops extension in place.

Invoked on demand by limap_tpu.ops.hostops (or manually:
``python limap_tpu/cpp/build.py``).  Uses the raw compiler — no
setuptools project needed for a single translation unit.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def build(verbose: bool = False) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "hostops.cpp")
    import numpy as np
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, f"_hostops{ext_suffix}")
    # cache keyed by a content hash of the source (like
    # ref_engine.srchash), never by mtime: a checked-out or copied
    # stale binary would otherwise be silently accepted
    import hashlib

    stamp = out + ".srchash"
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    if os.path.exists(out) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == digest:
                return out
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-shared", "-fPIC",
        "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        src, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=not verbose)
    with open(stamp, "w") as f:
        f.write(digest)
    return out


if __name__ == "__main__":
    print(build(verbose=True))
