"""AOT-exported MSM pipelines — the cold-start fix.

A cold process pays two serial costs before its first MSM:
  (a) jaxpr->MLIR lowering of the pipeline (~100-150 s per shape family on
      this host: tracing ~28k-op pallas adds dominates) — paid PER PROCESS,
      the persistent XLA cache cannot skip it;
  (b) XLA/Mosaic compilation (minutes) — skipped on a persistent-cache hit.

`jax.export` removes (a): the traced+lowered StableHLO of `_msm_pipeline`
is serialized to disk once (`scripts/aot_export.py`), and any later process
deserializes it and calls the embedded module directly — no tracing, no
lowering; the XLA compile of the deserialized module hits the persistent
cache (the exporting run populates it through the same call path).

The reference has no analogue (Rust is AOT by construction); this is the
TPU-native equivalent of its zero-warmup property (SURVEY.md §5
"Config/flag"; VERDICT r2 item 8).

Blob keys include a hash of the compute-path sources plus the jax version
and platform, so stale artifacts self-invalidate and fall back to the jit
path silently.
"""

from __future__ import annotations

import functools
import hashlib
import os
import pathlib

_SCHEMA = 1  # bump to invalidate every existing blob

_SRC_FILES = ("limbs.py", "field.py", "g1_ops.py", "pallas_kernels.py",
              "msm_device.py")


def aot_dir() -> pathlib.Path:
    return pathlib.Path(
        os.environ.get("CURDLEPROOFS_AOT_DIR", "/tmp/curdleproofs_aot"))


def enabled() -> bool:
    """AOT lookup is on by default; CURDLEPROOFS_AOT=0 pins the jit path."""
    return os.environ.get("CURDLEPROOFS_AOT", "1") != "0"


@functools.cache
def _code_hash() -> str:
    h = hashlib.sha256()
    here = pathlib.Path(__file__).parent
    for name in _SRC_FILES:
        h.update((here / name).read_bytes())
    return h.hexdigest()[:12]


def _blob_path(params, pallas: bool, madd: bool) -> pathlib.Path:
    import jax

    plat = jax.default_backend()
    name = (f"msm_s{_SCHEMA}_{_code_hash()}_jax{jax.__version__}_{plat}"
            f"_n{params.n}_c{params.c}_t{params.t_rows}_s{params.s_pad}"
            f"_p{int(pallas)}_m{int(madd)}.bin")
    return aot_dir() / name


def _abstract_args(params):
    import jax
    import jax.numpy as jnp

    m = 2 * params.n + 1
    u32 = jnp.uint32
    return (jax.ShapeDtypeStruct((12, m), u32),   # ext_px (packed limb pairs)
            jax.ShapeDtypeStruct((12, m), u32),   # ext_py
            jax.ShapeDtypeStruct((m,), u32),      # ext_zb (liveness bits)
            # uint16 over the link (halves the dominant upload); the
            # pipeline widens to uint32 lanes in _signed_digits
            jax.ShapeDtypeStruct((16, params.n), jnp.uint16))


def export_family(params, pallas: bool, madd: bool,
                  quiet: bool = False) -> pathlib.Path:
    """Trace+lower+serialize one (params, pallas, madd) pipeline family.

    Pays the full lowering once; also executes one real call so the XLA
    compile lands in the persistent cache through the exported call path.
    """
    import jax
    import numpy as np

    from .msm_device import _msm_pipeline

    def fn(px, py, zb, limbs):
        return _msm_pipeline(px, py, zb, limbs, n=params.n, c=params.c,
                             t_rows=params.t_rows, s_pad=params.s_pad,
                             pallas=pallas, madd=madd)

    # the pipeline embeds pallas custom calls ("tpu_custom_call"); exporting
    # them is safe here because the blob key pins platform + jax version
    exp = jax.export.export(
        jax.jit(fn),
        disabled_checks=[jax.export.DisabledSafetyCheck.custom_call(
            "tpu_custom_call")],
    )(*_abstract_args(params))
    path = _blob_path(params, pallas, madd)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(exp.serialize())
    tmp.replace(path)

    # compile-and-run through the deserialized artifact: populates the
    # persistent XLA cache with the exact module a cold process will compile
    loaded = _load_blob(path)
    args = [np.zeros(a.shape, a.dtype) for a in _abstract_args(params)]
    np.asarray(loaded(*args))
    # exec tier: pickle the compiled executable of the deserialized module
    # (lowering exp.call is trivial, the compile just hit the cache above)
    got_exec = _export_exec(loaded, _abstract_args(params), path)
    if not quiet:
        size = path.stat().st_size
        print(f"exported {path.name} ({size / 1e6:.1f} MB, "
              f"exec={'yes' if got_exec else 'no'})", flush=True)
    return path


def _load_blob(path: pathlib.Path):
    import jax

    exp = jax.export.deserialize(path.read_bytes())
    return jax.jit(exp.call)


# --------------------------------------------------------------------------
# compiled-executable tier: skips XLA compilation entirely at load
# --------------------------------------------------------------------------
# The StableHLO blobs kill the per-process LOWERING cost; the deserialized
# module must still be XLA-compiled (persistent-cache-accelerated, but the
# r04 cold probe measured ~50 s of retrieval+compile on the tunnel).  The
# exec tier pickles the compiled PJRT executable itself
# (jax.experimental.serialize_executable), so a cold process pays only
# deserialize+load — keyed by the same code hash + jax version + platform.

def _exec_twin(path: pathlib.Path) -> pathlib.Path:
    return path.with_suffix(".exec")


def _export_exec(fn, abstract_args, blob_path: pathlib.Path) -> bool:
    """Compile fn at the abstract args and pickle the executable next to
    the StableHLO blob; best-effort (False when unsupported)."""
    import pickle

    import jax

    try:
        from jax.experimental import serialize_executable as se

        compiled = jax.jit(fn).lower(*abstract_args).compile()
        payload, in_tree, out_tree = se.serialize(compiled)
        blob = pickle.dumps((payload, in_tree, out_tree))
    except Exception:
        return False
    tmp = _exec_twin(blob_path).with_suffix(".exec.tmp")
    tmp.write_bytes(blob)
    tmp.replace(_exec_twin(blob_path))
    return True


def _load_exec(blob_path: pathlib.Path):
    """Compiled executable for a family if its exec twin exists, else None."""
    import pickle

    p = _exec_twin(blob_path)
    if not p.is_file():
        return None
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = pickle.loads(p.read_bytes())
        compiled = se.deserialize_and_load(payload, in_tree, out_tree)
        return lambda *args: compiled(*args)
    except Exception:  # runtime drift etc.: fall back to the StableHLO tier
        return None


def _ingest_blob_path(n: int, pallas: bool) -> pathlib.Path:
    import jax

    plat = jax.default_backend()
    name = (f"ingest_s{_SCHEMA}_{_code_hash()}_jax{jax.__version__}_{plat}"
            f"_n{n}_p{int(pallas)}.bin")
    return aot_dir() / name


def export_ingest(n: int, pallas: bool, quiet: bool = False) -> pathlib.Path:
    """Trace+lower+serialize the compressed-base ingest (sqrt-chain y
    reconstruction, `msm_device._ingest_compressed`) for one padded family.

    The ingest is the other jit a cold MSM pays besides the pipeline
    (r03 cold probe: 46 s of the 455 s cold start were the 2^16 base
    upload, dominated by ingest lowering+compile)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .msm_device import _ingest_compressed

    def fn(pxp, meta):
        return _ingest_compressed(pxp, meta, pallas=pallas)

    u32 = jnp.uint32
    exp = jax.export.export(
        jax.jit(fn),
        disabled_checks=[jax.export.DisabledSafetyCheck.custom_call(
            "tpu_custom_call")],
    )(jax.ShapeDtypeStruct((12, n), u32), jax.ShapeDtypeStruct((n,), u32))
    path = _ingest_blob_path(n, pallas)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(exp.serialize())
    tmp.replace(path)

    loaded = _load_blob(path)
    jax.block_until_ready(loaded(np.zeros((12, n), np.uint32),
                                 np.zeros((n,), np.uint32)))
    got_exec = _export_exec(
        loaded, (jax.ShapeDtypeStruct((12, n), jnp.uint32),
                 jax.ShapeDtypeStruct((n,), jnp.uint32)), path)
    if not quiet:
        print(f"exported {path.name} ({path.stat().st_size / 1e6:.1f} MB, "
              f"exec={'yes' if got_exec else 'no'})", flush=True)
    return path


def maybe_load_ingest(n: int, pallas: bool):
    """Compiled ingest for this family if a blob exists, else None."""
    if not enabled():
        return None
    key = str(_ingest_blob_path(n, pallas))
    if key in _LOADED:
        return _LOADED[key]
    fn = _load_exec(pathlib.Path(key))
    if fn is None and pathlib.Path(key).is_file():
        try:
            fn = _load_blob(pathlib.Path(key))
        except Exception:
            fn = None
    _LOADED[key] = fn
    return fn


# in-memory cache: (path) -> compiled callable or None (negative hit)
_LOADED: dict[str, object] = {}


def maybe_load(params, pallas: bool, madd: bool):
    """Compiled pipeline for this family if a matching blob exists, else
    None (caller falls back to the jit path)."""
    if not enabled():
        return None
    path = _blob_path(params, pallas, madd)
    key = str(path)
    if key in _LOADED:
        return _LOADED[key]
    fn = _load_exec(path)  # exec tier first: no XLA compile at all
    if fn is None and path.is_file():
        try:
            fn = _load_blob(path)
        except Exception:  # stale/corrupt blob: fall back silently
            fn = None
    _LOADED[key] = fn
    return fn
