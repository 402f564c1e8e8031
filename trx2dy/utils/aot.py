"""AOT trace cache: skip per-process jit TRACING of the big fold programs.

The staged fold protocol's program family costs ~60 s of host-side jit
tracing + StableHLO lowering per process at production shapes (measured,
scripts/profile_trace_cost.py) before the on-disk XLA compile cache can
even be consulted — the dominant share of the e2e pipeline's first-fold
fixed cost (EXAMPLE_RESULTS.md). jax.export can serialize the lowered
module once; later processes deserialize it (proto parse, ~ms/MB) instead
of re-tracing Python.

Opt-in via TRX2DY_AOT_CACHE=1 (or aot.enable()): correctness of a stale
artifact is guarded by keying every entry on a content hash of the whole
`trx2dy` source tree plus the jax version, backend platform, and the
flattened argument avals — any source edit, version bump, or shape change
misses the cache and falls back to the normal trace path (which then
refreshes the entry). Multi-device / explicitly-sharded arguments always
use the plain path: exported modules pin the lowering-time shardings, and
the production single-chip paths are where the fixed cost hurts.

Note the XLA compile cache key of the deserialized call wrapper differs
from the plain jit's, so the FIRST AOT-enabled run per machine recompiles
the family (minutes on TPU) — after that both layers are warm. That is
why this stays opt-in for batch/pipeline entry points rather than default
for one-off scripts.
"""
from __future__ import annotations

import hashlib
import os
import pickle
import threading
import warnings

_ENABLED = os.environ.get("TRX2DY_AOT_CACHE", "") not in ("", "0")
_lock = threading.Lock()
_mem: dict = {}          # key -> (callable, out_treedef) | _FAILED sentinel
_FAILED = object()       # negative-cache entry: export failed once, don't
                         # re-pay trace+lower on every chunked call
_src_hash: str | None = None
_unkeyable_warned: set = set()   # program names warned about object leaves


def _default_dir() -> str:
    # Private per-user location (NOT world-writable /tmp): the .tree
    # artifact is unpickled at load time, so the directory must not be
    # plantable by another local user.
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "trx2dy_aot")


def enable(path: str | None = None) -> None:
    global _ENABLED
    _ENABLED = True
    if path is not None:
        os.environ["TRX2DY_AOT_CACHE_DIR"] = path


def enabled() -> bool:
    return _ENABLED


def _cache_dir() -> str:
    d = os.environ.get("TRX2DY_AOT_CACHE_DIR", _default_dir())
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.stat(d)
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        # pre-created by someone else, or group/other-writable: refuse to
        # unpickle from it (a planted .tree would execute arbitrary code)
        raise RuntimeError(f"AOT cache dir {d!r} is not a private "
                           f"user-owned directory")
    return d


def _source_hash() -> str:
    """Content hash of every trx2dy .py file: ANY source edit invalidates
    the whole AOT cache (the artifacts encode compiled numerics)."""
    global _src_hash
    if _src_hash is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.blake2b(digest_size=16)
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _src_hash = h.hexdigest()
    return _src_hash


def _single_device_ok(leaves) -> bool:
    """Plain-path gate: exported modules bake lowering-time shardings, so
    any argument committed across >1 device (the 8-device test mesh, the
    multichip dryrun's dp-sharded batches) keeps the normal jit path;
    production single-chip args — host numpy or single-device-committed —
    are where the fixed cost is."""
    for leaf in leaves:
        s = getattr(leaf, "sharding", None)
        if s is not None and getattr(s, "num_devices", 1) != 1:
            return False
    return True


def aot_call(name: str, fn, args: tuple, kwargs: dict | None = None,
             static_key: str = ""):
    """Run `fn(*args, **kwargs)` through the AOT trace cache.

    fn must be traceable (a jitted function is fine — it inlines) and PURE
    in its array arguments; `static_key` must fingerprint every non-array
    configuration baked into fn (the caller's static_argnames values).
    args/kwargs may be arbitrary pytrees (None leaves fine). Returns fn's
    pytree result. Any cache trouble falls back to the plain call —
    behavior is identical either way, only trace cost differs.
    """
    import jax

    kwargs = kwargs or {}
    flat, in_tree = jax.tree.flatten((args, kwargs))
    if not _ENABLED or not _single_device_ok(flat):
        return fn(*args, **kwargs)

    import numpy as np
    import jaxlib

    _VALUE_LEAVES = (int, float, bool, str, bytes, type(None))

    def _aval(x):
        # Arrays key on (shape, dtype); value-bearing Python scalars key on
        # their VALUE — a call site passing a config scalar outside
        # static_key must not collide. Other objects raise: a default
        # address-bearing repr (<Foo object at 0x..>) would produce a NEW
        # key on every call, so every call would pay a full export + write
        # a fresh artifact — quietly slower than cache-off with unbounded
        # disk growth. Such leaves use the plain path instead (below).
        if hasattr(x, "dtype") or isinstance(x, np.ndarray):
            return (np.shape(x), str(x.dtype))
        if isinstance(x, _VALUE_LEAVES):
            return ("pyleaf", repr(x))
        raise TypeError(f"unkeyable leaf {type(x).__name__}")

    try:
        avals = tuple(_aval(x) for x in flat)
    except TypeError as e:
        if name not in _unkeyable_warned:
            _unkeyable_warned.add(name)
            warnings.warn(f"AOT cache bypassed for program {name!r}: {e} "
                          f"(object leaves cannot be stably keyed)",
                          stacklevel=2)
        return fn(*args, **kwargs)
    platform = jax.devices()[0].platform
    numerics_cfg = (jax.config.jax_enable_x64,
                    jax.config.jax_default_matmul_precision)
    raw = repr((name, static_key, avals, platform, jax.__version__,
                getattr(jaxlib, "__version__", "?"), numerics_cfg,
                _source_hash(), str(in_tree))).encode()
    key = hashlib.blake2b(raw, digest_size=16).hexdigest()

    with _lock:
        hit = _mem.get(key)
    if hit is _FAILED:
        return fn(*args, **kwargs)
    if hit is None:
        try:
            hit = _load_or_build(key, name, fn, in_tree, flat)
        except Exception as e:                  # noqa: BLE001
            # Negative-cache the failure: without this, fused stage
            # programs whose export raises (e.g. custom calls off the
            # jax.export allowlist) would re-pay a full trace+lower on
            # EVERY chunked call — far slower than cache-off.
            with _lock:
                first = _mem.get(key) is not _FAILED
                _mem[key] = _FAILED
            if first:
                warnings.warn(f"AOT cache disabled for program {name!r}: "
                              f"{type(e).__name__}: {e}", stacklevel=2)
            return fn(*args, **kwargs)
        with _lock:
            _mem[key] = hit
    call, out_tree = hit
    try:
        out = call(*flat)
    except Exception as e:                      # noqa: BLE001
        # A deserialized artifact can fail at CALL time (jaxlib-only
        # rebuild, platform quirk): evict it and run the plain path
        # rather than breaking a run that works with the cache off.
        with _lock:
            _mem[key] = _FAILED
        try:
            # _cache_dir() itself can raise (dir deleted / repointed /
            # permissions changed mid-run); artifact cleanup failing must
            # still fall through to the plain call below — the documented
            # "never wronger than plain jit" guarantee
            d = _cache_dir()
            for ext in (".jaxexp", ".tree"):
                try:
                    os.remove(os.path.join(d, f"{name}-{key}{ext}"))
                except OSError:
                    pass
        except Exception:                       # noqa: BLE001
            pass
        warnings.warn(f"AOT artifact for {name!r} failed at call time "
                      f"({type(e).__name__}: {e}); evicted, using plain "
                      f"jit path", stacklevel=2)
        return fn(*args, **kwargs)
    return jax.tree.unflatten(out_tree, out)


def _load_or_build(key, name, fn, in_tree, flat):
    import jax
    from jax import export as jex

    path = os.path.join(_cache_dir(), f"{name}-{key}")
    if os.path.exists(path + ".jaxexp") and os.path.exists(path + ".tree"):
        try:
            with open(path + ".jaxexp", "rb") as f:
                exp = jex.deserialize(bytearray(f.read()))
            with open(path + ".tree", "rb") as f:
                out_tree = pickle.load(f)
            return jax.jit(exp.call), out_tree
        except Exception:
            pass                 # stale/corrupt artifact: rebuild below

    out_box = []

    def flat_fn(*leaves):
        a, kw = jax.tree.unflatten(in_tree, leaves)
        leaves_out, tree = jax.tree.flatten(fn(*a, **kw))
        out_box.append(tree)
        return leaves_out

    exp = jex.export(jax.jit(flat_fn))(*flat)
    out_tree = out_box[-1]
    try:
        blob = exp.serialize()
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp + ".tree", "wb") as f:
            pickle.dump(out_tree, f)
        with open(tmp + ".jaxexp", "wb") as f:
            f.write(blob)
        # .tree lands first: a crash between the two replaces leaves no
        # half entry (_load_or_build requires both files)
        os.replace(tmp + ".tree", path + ".tree")
        os.replace(tmp + ".jaxexp", path + ".jaxexp")
    except Exception:
        # unserializable entry: still usable within this process
        pass
    return jax.jit(exp.call), out_tree
