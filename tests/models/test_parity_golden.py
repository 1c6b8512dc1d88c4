"""Golden-output regression tests for all six families.

The reference's dummy specs instantiate real diffusers classes
(`/root/reference/tests/models/ltx_video/base_specification.py:8-63`) to pin
numerics. This environment has no diffusers and no network, so true
cross-framework goldens cannot be generated here; instead each family's
`spec.forward` output on FIXED weights and FIXED inputs is recorded once into
a committed npz. Any refactor that silently changes the model math (rope
frequency splits, norm placement, scan layout, remat policies, kernel swaps)
fails these tests — the converters' exact diffusers key-set tests cover the
naming side of parity.

Regenerate (only after an INTENDED numerics change):
    python tests/models/test_parity_golden.py --record
"""

import pathlib
import sys

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def _forward(name):
    import jax
    import jax.numpy as jnp

    from tests.models.test_model_zoo import FAMILIES, _setup

    spec, tr, vae, enc, bc, bl, export, load, media = _setup(name)
    # Deterministic weights: re-init every param from one fixed key so the
    # golden does not depend on flax's default init ordering staying stable.
    from finetrainers_tpu.models.modeling_utils import flatten_params, unflatten_params

    flat = flatten_params(tr.params)
    params = {}
    for i, key in enumerate(sorted(flat)):
        leaf = flat[key]
        k = jax.random.fold_in(jax.random.PRNGKey(1234), i)
        params[key] = (0.02 * jax.random.normal(k, leaf.shape, jnp.float32)).astype(leaf.dtype)
    tr = type(tr)(tr.module, unflatten_params(params), tr.config)

    pred, target, sigmas = spec.forward(tr, bc, bl, jnp.asarray([0.4]), jax.random.PRNGKey(7))
    return np.asarray(pred, np.float32), np.asarray(target, np.float32)


def _golden_path(name):
    return GOLDEN_DIR / f"{name}.npz"


FAMILY_NAMES = ["ltx_video", "wan", "flux", "cogvideox", "cogview4", "hunyuan_video"]


@pytest.mark.parametrize("name", FAMILY_NAMES)
def test_forward_matches_golden(name):
    path = _golden_path(name)
    if not path.exists():
        pytest.skip(f"golden {path.name} not recorded")
    golden = np.load(path)
    pred, target = _forward(name)
    np.testing.assert_allclose(pred, golden["pred"], atol=1e-4, rtol=1e-4,
                               err_msg=f"{name} pred drifted from golden")
    np.testing.assert_allclose(target, golden["target"], atol=1e-4, rtol=1e-4,
                               err_msg=f"{name} target drifted from golden")


if __name__ == "__main__" and "--record" in sys.argv:
    # Goldens are CPU-recorded: pytest runs on the forced-CPU mesh (conftest),
    # and TPU matmul precision differs by ~1e-3. Pin the platform before any
    # device use (the axon sitecustomize pre-imports jax on the TPU tunnel).
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name in FAMILY_NAMES:
        if _golden_path(name).exists() and "--force" not in sys.argv:
            print(f"skip {name} (exists)")
            continue
        pred, target = _forward(name)
        np.savez_compressed(_golden_path(name), pred=pred, target=target)
        print(f"recorded {name}: pred{pred.shape} target{target.shape}")
