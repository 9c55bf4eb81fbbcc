"""Rewrite XLA:CPU persistent-cache entries in place, scrubbing the LLVM
tuning pseudo-features (prefer-no-gather/scatter) that make the AOT
loader reject every entry (see utils/jaxcache.py). The live scrub handles
reads through jax's cache API; this tool repairs entries on disk so ANY
load path sees clean bytes."""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from jax._src import compilation_cache as cc

from manta_tpu.utils.jaxcache import _scrub_pseudo_features

root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
n_fixed = 0
for f in glob.glob(os.path.join(root, "cpu-*", "*-cache")):
    data = open(f, "rb").read()
    try:
        raw = cc.decompress_executable(data)
    except Exception:
        continue
    fixed = _scrub_pseudo_features(raw)
    if fixed != raw:
        tmp = f + ".tmp"
        with open(tmp, "wb") as out:
            out.write(cc.compress_executable(fixed))
        os.replace(tmp, f)
        n_fixed += 1
print(f"scrubbed {n_fixed} entries under {root}")
