"""Compile-time regression: scan-over-layers keeps the traced program O(1) in
depth (one block body) instead of O(L) HLO copies — the TPU analog of the
reference's regional torch.compile (`utils/torch.py:44-65`)."""

import pathlib
import sys

import jax
import jax.numpy as jnp

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.dummy import DummyTransformer  # noqa: E402


def _jaxpr_eqns(module):
    params = jax.eval_shape(
        lambda r: module.init(r, jnp.zeros((1, 4, 1, 4, 4)), jnp.zeros((1, 6, 32)),
                              jnp.zeros((1,)))["params"],
        jax.random.PRNGKey(0),
    )

    def fwd(p):
        return module.apply({"params": p}, jnp.zeros((1, 4, 1, 4, 4)),
                            jnp.zeros((1, 6, 32)), jnp.zeros((1,)))

    jaxpr = jax.make_jaxpr(fwd)(params)
    return len(jaxpr.jaxpr.eqns)


def test_scan_program_size_constant_in_depth():
    cfg = dict(in_channels=4, dim=32, num_heads=2, caption_dim=32, patch_size=(1, 2, 2))
    loop16 = _jaxpr_eqns(DummyTransformer(**cfg, num_layers=16, use_scan=False))
    loop32 = _jaxpr_eqns(DummyTransformer(**cfg, num_layers=32, use_scan=False))
    scan16 = _jaxpr_eqns(DummyTransformer(**cfg, num_layers=16, use_scan=True))
    scan32 = _jaxpr_eqns(DummyTransformer(**cfg, num_layers=32, use_scan=True))
    # loop grows linearly; scan does not grow at all
    assert loop32 > loop16 + 100
    assert scan32 == scan16
    assert scan32 < loop32 / 4


def test_scan_defaults_on_for_deep_stacks():
    cfg = dict(in_channels=4, dim=32, num_heads=2, caption_dim=32, patch_size=(1, 2, 2))
    deep = DummyTransformer(**cfg, num_layers=12)  # use_scan=None -> auto
    shallow = DummyTransformer(**cfg, num_layers=2)
    assert deep.scan_stacks() == [("blocks", 12, 1)]
    assert shallow.scan_stacks() == []
    # block_skip advertises pair grouping
    assert DummyTransformer(**cfg, num_layers=12, gradient_checkpointing="block_skip").scan_stacks() == [
        ("blocks", 12, 2)
    ]
