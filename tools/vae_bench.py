"""Precompute-stage benchmark: LTX 3D VAE encode (and decode) on the real chip.

The training pipeline's precomputation pass (reference --enable_precomputation;
`data/precomputation.py` here) is VAE-encode bound: every video is pushed once
through the 3D causal encoder before training starts. No public reference
throughput exists, so this records the TPU number for the dossier: pixels/sec
through encode at the flagship conditions (49f x 512 x 768, bf16 VAE) and the
decode rate used by validation sampling.

Usage: python tools/vae_bench.py [encode|decode ...]
Env:   BENCH_TINY=1 (plumbing smoke), BENCH_REPS (default 5)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = os.environ.get("BENCH_TINY") == "1"
REPS = int(os.environ.get("BENCH_REPS", "5"))
# flagship media shape (B, C, T, H, W); LTX VAE: 32x spatial, 8x temporal
F, H, W = (9, 64, 64) if TINY else (49, 512, 768)


def main() -> None:
    import jax

    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from finetrainers_tpu.models.autoencoders import AutoencoderKL3D, LTX_VAE_CONFIG
    from finetrainers_tpu.models.modeling_utils import ModelHandle

    cfg = LTX_VAE_CONFIG
    if TINY:
        import dataclasses

        cfg = dataclasses.replace(cfg, block_out_channels=(32, 32), layers_per_block=1)
    module = AutoencoderKL3D(cfg, dtype=jnp.bfloat16)
    ratio = cfg.spatial_compression_ratio
    shapes = jax.eval_shape(
        lambda r: module.init(r, jnp.zeros((1, 3, 1, ratio, ratio), jnp.float32))["params"],
        jax.random.PRNGKey(0),
    )
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
    handle = ModelHandle(module, params, {"spatial_compression_ratio": ratio})

    modes = sys.argv[1:] or ["encode", "decode"]
    x = jnp.zeros((1, 3, F, H, W), jnp.bfloat16)

    if "encode" in modes:
        enc = jax.jit(lambda p, x: module.apply({"params": p}, x, method=AutoencoderKL3D.encode))
        _time("encode", enc, params, x, pixels=F * H * W)
    if "decode" in modes:
        moments = np.asarray(
            jax.jit(lambda p, x: module.apply({"params": p}, x, method=AutoencoderKL3D.encode))(params, x)
        )
        z = jnp.asarray(moments[:, : moments.shape[1] // 2])
        dec = jax.jit(lambda p, z: module.apply({"params": p}, z, method=AutoencoderKL3D.decode))
        _time("decode", dec, params, z, pixels=F * H * W)


def _time(name, fn, params, x, pixels: int) -> None:
    import time

    import numpy as np

    t0 = time.perf_counter()
    out = fn(params, x)
    _ = np.asarray(out).ravel()[0]
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(params, x)
    _ = np.asarray(out).ravel()[0]
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"vae_{name:6s} {ms:9.1f} ms/clip  {pixels / ms * 1e3 / 1e6:8.1f} Mpix/s  "
          f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
