"""Disk-backed `jax.export` artifacts: skip re-tracing on repeat runs.

The XLA persistent compile cache only skips the backend COMPILE step;
JAX still re-traces the Python function and re-lowers it to StableHLO in
every process. For the virtual-mesh dry-run/test paths the traced
programs are enormous (interpret-mode Pallas bodies inlined as plain HLO:
the warm 8-device dry-run prove stage measured 240s of tracing + 173s of
MLIR lowering against 193s of execution), so re-tracing dominates wall
clock even with every executable cached.

This module serializes the `jax.export` artifact of a jitted program,
keyed by (jax version, manta_tpu source-tree hash, tag, argument
shapes/dtypes), and replays it on later runs — trace + lower happen once
per source revision. The source-tree hash makes stale artifacts
impossible: any edit under `manta_tpu/` invalidates every entry.

Scope: CPU-platform processes only (the dry-run/test environment) — on
the real TPU the traced programs are small Pallas custom calls and the
normal jit path is fine. Opt out with MANTA_AOT_CACHE=0.
"""

from __future__ import annotations

import functools
import hashlib
import os
from typing import Callable

def _cache_dir() -> str:
    if "MANTA_AOT_CACHE_DIR" in os.environ:
        return os.environ["MANTA_AOT_CACHE_DIR"]
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(pkg_root, ".jax_cache", "export")


CACHE_DIR = _cache_dir()


@functools.lru_cache(maxsize=1)
def _source_hash() -> str:
    """Content hash of every manta_tpu .py file (order-stable)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    paths = []
    for dirpath, _, names in os.walk(root):
        for name in names:
            if name.endswith(".py"):
                paths.append(os.path.join(dirpath, name))
    for path in sorted(paths):
        h.update(path.encode())
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


@functools.lru_cache(maxsize=1)
def enabled() -> bool:
    if os.environ.get("MANTA_AOT_CACHE", "1") == "0":
        return False
    import jax

    try:
        platforms = jax.config.jax_platforms or ""
        return platforms.split(",")[0].strip() == "cpu"
    except Exception:  # noqa: BLE001
        return False


def _key(tag: str, mesh, args) -> str:
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(_source_hash().encode())
    h.update(tag.encode())
    # exported programs are lowered for a specific device mesh: a replay at
    # a different device count / axis layout must miss, not fail
    if mesh is not None:
        h.update(
            f"mesh:{tuple(mesh.shape.items())}:{mesh.devices.size};".encode()
        )
    leaves, treedef = jax.tree_util.tree_flatten(args)
    h.update(str(treedef).encode())
    for leaf in leaves:
        h.update(f"{leaf.shape}:{leaf.dtype};".encode())
    return h.hexdigest()[:32]


_MEM: dict = {}


@functools.lru_cache(maxsize=1)
def _register_pytrees() -> None:
    """jax.export can only serialize registered pytree node types; the
    point containers appear in exported out_trees."""
    from jax import export as jexport

    from manta_tpu.ops.curve import JacobianPoint

    try:
        jexport.register_namedtuple_serialization(
            JacobianPoint, serialized_name="manta_tpu.JacobianPoint"
        )
    except ValueError:
        pass  # already registered


def call_cached(tag: str, make_jit_fn: Callable, mesh, *args):
    """Call `make_jit_fn()(*args)`, replaying a serialized export when one
    exists for (tag, arg shapes, source revision). `mesh` provides the
    device context the exported program executes under."""
    import jax

    if not enabled():
        return make_jit_fn()(*args)
    from jax import export as jexport

    _register_pytrees()

    key = _key(tag, mesh, args)
    exp = _MEM.get(key)
    path = os.path.join(CACHE_DIR, f"{key}.jaxexport")
    if exp is None and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(bytearray(f.read()))
        except Exception:  # noqa: BLE001 — stale/corrupt artifact: rebuild
            exp = None
            try:
                os.remove(path)
            except OSError:
                pass
    if exp is None:
        abstract = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args
        )
        exp = jexport.export(make_jit_fn())(*abstract)
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(exp.serialize())
        os.replace(tmp, path)
    _MEM[key] = exp
    try:
        with jax.set_mesh(mesh):
            return exp.call(*args)
    except Exception:  # noqa: BLE001 — replay failed (e.g. stale artifact
        # exported for another device layout): fall back to a live jit
        try:
            os.remove(path)
        except OSError:
            pass
        _MEM.pop(key, None)
        return make_jit_fn()(*args)
