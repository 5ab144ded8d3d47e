"""Disk-backed trace cache: jax.export StableHLO blobs keyed by input avals.

The heavy jitted programs (the vmapped Boltzmann solver heads, the LOS
transfer scan, lensing) cost ~minutes of *Python tracing* in every fresh
process on a 1-vCPU host — even when the persistent XLA compile cache is hot,
because jax.jit re-traces before it can look up the executable. StableHLO
export blobs are machine-independent, serialize once per (program, shapes)
and deserialize in milliseconds; the compile step behind `Exported.call`
then hits the persistent compile cache like any other jit.

This is the runtime analog of the reference's one-time `make -j`: the first
process ever to see a program shape pays tracing + compile; every later
process pays neither. (The reference amortizes its build the same way —
compile once, run many; here the "build products" are NumPy-shaped.)

Platform handling: the pipeline pins table-building stages to the host CPU
backend (pipeline._host_device) while the hot stages run on the accelerator,
so the target platform is resolved per call — the jax.default_device context
if one is active, else the default backend — the blob is exported for exactly
that platform, and the call arguments are committed there so `Exported.call`
never sees a platform mismatch.

Usage:
    fn = jax.jit(jax.vmap(...))
    fast = export_cached(fn, tag="pt_init", static_key=(repr(idx), ic))
    out = fast(*args)            # trace-free after the first process

Falls back to plain jit transparently when export fails (multi-device
sharded inputs, exotic primitives) or when CLASSPP_TRACE_CACHE=off.
"""

from __future__ import annotations

import hashlib
import os

import jax

_MEM: dict = {}          # key -> deserialized Exported (per-process memo)
_DISABLED = os.environ.get("CLASSPP_TRACE_CACHE", "").lower() in (
    "off", "0", "none", "disable")


def _blob_dir():
    d = jax.config.jax_compilation_cache_dir
    if not d:
        return None
    p = os.path.join(os.path.dirname(d), "trace_cache")
    try:
        os.makedirs(p, exist_ok=True)
        return p
    except OSError:
        return None


def _target_device():
    """Device the program should run on: the active jax.default_device
    context if set, else the first device of the default backend."""
    try:
        d = jax.config.jax_default_device
        if d is not None:
            return d
    except Exception:
        pass
    return jax.local_devices(backend=jax.default_backend())[0]


def _aval_sig(args):
    """Shape/dtype/pytree signature of the call arguments."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for x in leaves:
        a = jax.api_util.shaped_abstractify(x)
        parts.append(f"{a.shape}{a.dtype}{getattr(a, 'weak_type', False)}")
    return "|".join(parts)


_SRC_HASH = None


def _src_hash():
    """Content hash of the package's traced source: a code edit must
    invalidate every blob (the exported StableHLO bakes the old trace in;
    __version__ alone would serve stale programs during development)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        import glob

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for p in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                                  recursive=True)):
            with open(p, "rb") as f:
                h.update(f.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _key(tag, static_key, platform, args):
    from .. import __version__

    blob = repr((tag, static_key, __version__, _src_hash(), jax.__version__,
                 platform, jax.config.jax_enable_x64, _aval_sig(args)))
    return f"{tag}-{hashlib.sha256(blob.encode()).hexdigest()[:20]}"


def export_cached(jit_fn, tag: str, static_key=()):
    """Wrap a jitted function with the disk trace cache. The wrapper keys on
    the runtime avals of each call, so one wrapper serves many shapes."""
    if _DISABLED:
        return jit_fn

    def call(*args):
        # multi-device sharded inputs: jax.export covers single-device
        # programs; under a mesh fall back to plain jit (GSPMD path)
        try:
            if any(getattr(x, "sharding", None) is not None
                   and len(x.sharding.device_set) > 1
                   for x in jax.tree_util.tree_leaves(args)):
                return jit_fn(*args)
            dev = _target_device()
        except Exception:
            return jit_fn(*args)
        key = _key(tag, static_key, dev.platform, args)
        rt = _MEM.get(key)
        if rt is None:
            d = _blob_dir()
            path = os.path.join(d, key + ".stablehlo") if d else None
            if path and os.path.exists(path):
                try:
                    with open(path, "rb") as f:
                        rt = _deserialize(f.read())
                except Exception:
                    rt = None
            if rt is None:
                try:
                    rt = jax.export.export(jit_fn,
                                           platforms=[dev.platform])(*args)
                except Exception as e:
                    # unexportable program: permanently fall back (memo so
                    # we don't re-attempt the export per call)
                    if os.environ.get("CLASSPP_TRACE_DEBUG"):
                        import sys as _sys

                        print(f"[trace_cache] export failed for {tag}: "
                              f"{type(e).__name__}: {e}", file=_sys.stderr)
                    _MEM[key] = False
                    return jit_fn(*args)
                if path:
                    try:
                        blob = _serialize(rt)
                        tmp = path + f".tmp{os.getpid()}"
                        with open(tmp, "wb") as f:
                            f.write(blob)
                        os.replace(tmp, path)
                    except Exception as e:
                        if os.environ.get("CLASSPP_TRACE_DEBUG"):
                            import sys as _sys

                            print(f"[trace_cache] serialize failed for "
                                  f"{tag}: {type(e).__name__}: {e}",
                                  file=_sys.stderr)
            # jit(rt.call): keeps normal jit output-placement semantics
            # (bare Exported.call commits its outputs to the device, which
            # poisons downstream eager ops that mix them with sharded
            # arrays); the re-trace is one call_exported primitive — cheap
            _MEM[key] = jax.jit(rt.call)
        rt = _MEM[key]
        if rt is False:
            return jit_fn(*args)
        # move only PLATFORM-mismatched leaves (host-built tables entering an
        # accelerator program); same-platform commitment is left untouched so
        # placement semantics match plain jit
        def _move(x):
            s = getattr(x, "sharding", None)
            if s is None:
                return x
            try:
                if next(iter(s.device_set)).platform != dev.platform:
                    return jax.device_put(x, dev)
            except Exception:
                pass
            return x

        args = jax.tree_util.tree_map(_move, args)
        try:
            out = rt(*args)
        except Exception:
            return jit_fn(*args)
        # the exported call commits its outputs (plain jit does not); strip
        # the commitment so downstream eager ops can mix them with sharded /
        # other-device arrays exactly as before (zero-copy view)
        return jax.tree_util.tree_map(_uncommit, out)

    return call


_SER_REGISTERED: set = set()


def _register_type(cls):
    """Register a custom pytree node type for export serialization:
    NamedTuples via the dedicated hook, dataclass pytrees (CosmoParams-style,
    auxdata = tuple of static fields) via pickle'd auxdata."""
    if cls in _SER_REGISTERED:
        return
    _SER_REGISTERED.add(cls)
    name = f"{cls.__module__}.{cls.__qualname__}"
    try:
        if isinstance(cls, type) and issubclass(cls, tuple) \
                and hasattr(cls, "_fields"):
            jax.export.register_namedtuple_serialization(
                cls, serialized_name=name)
        else:
            import pickle

            jax.export.register_pytree_node_serialization(
                cls, serialized_name=name,
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads)
    except Exception:
        pass


def _serialize(rt):
    """rt.serialize() with on-demand registration of the custom pytree types
    named in its 'unregistered type' errors (covers output-tree types that
    an input-side walk cannot see)."""
    import importlib
    import re

    for _ in range(20):
        try:
            return rt.serialize()
        except ValueError as e:
            m = re.search(r"unregistered type `<class '([\w\.]+)\.(\w+)'>`",
                          str(e))
            if not m:
                raise
            mod = importlib.import_module(m.group(1))
            cls = getattr(mod, m.group(2))
            if cls in _SER_REGISTERED:
                raise
            _register_type(cls)
    return rt.serialize()


def _deserialize(blob):
    """jax.export.deserialize with on-demand registration of the custom
    pytree types named in the blob (a fresh process has not run the
    _register_type calls the serializing process did)."""
    import importlib
    import re

    for _ in range(20):
        try:
            return jax.export.deserialize(blob)
        except Exception as e:
            found = None
            for dotted in re.findall(r"'?([A-Za-z_][\w\.]+\.\w+)'?", str(e)):
                mod_name, _, cls_name = dotted.rpartition(".")
                try:
                    cls = getattr(importlib.import_module(mod_name), cls_name)
                except Exception:
                    continue
                if isinstance(cls, type) and cls not in _SER_REGISTERED:
                    found = cls
                    break
            if found is None:
                raise
            _register_type(found)
    return jax.export.deserialize(blob)


def _uncommit(x):
    try:
        from jax._src import array as _jarr

        if (isinstance(x, _jarr.ArrayImpl) and x._committed
                and len(x.sharding.device_set) == 1):
            return _jarr.ArrayImpl(
                x.aval, x.sharding, [s.data for s in x.addressable_shards],
                committed=False, _skip_checks=True)
    except Exception:
        pass
    return x
