"""MeshEnv / sharding-rule tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from finetrainers_tpu.parallel import MeshEnv, ParallelDims, infer_fsdp_spec, make_param_shardings, shard_pytree


class TestParallelDims:
    def test_world_size(self):
        dims = ParallelDims(dp_replicate=2, dp_shard=2, cp=2, tp=1)
        assert dims.world_size == 8

    def test_pp_composes_with_all_axes(self):
        # pp is a trained path (beyond the reference, which raises for pp>1)
        # and composes with dp/cp/tp (the pipeline shard_map is manual over
        # pp+dp only; cp/tp stay GSPMD-auto inside the stage program).
        dims = ParallelDims(pp=2, dp_replicate=2, dp_shard=2)
        assert dims.world_size == 8
        assert ParallelDims(pp=2, cp=2).world_size == 4
        assert ParallelDims(pp=2, tp=2).world_size == 4

    def test_invalid_degree(self):
        with pytest.raises(ValueError):
            ParallelDims(dp_shard=0)


class TestMeshEnv:
    def test_default_fsdp_mesh(self):
        env = MeshEnv()
        assert env.world_size == 8
        assert env.dims.dp_shard == 8
        assert env.data_sharding_enabled

    def test_mismatched_world_raises(self):
        with pytest.raises(ValueError):
            MeshEnv(ParallelDims(dp_shard=3))

    def test_hsdp_mesh(self):
        env = MeshEnv(ParallelDims(dp_replicate=2, dp_shard=4))
        assert env.data_replication_enabled and env.data_sharding_enabled
        assert env.mesh.shape["dp_replicate"] == 2
        assert env.mesh.shape["dp_shard"] == 4

    def test_data_sharding_batch(self):
        env = MeshEnv(ParallelDims(dp_replicate=2, dp_shard=4))
        batch = {"latents": np.zeros((8, 16, 4), dtype=np.float32)}
        placed = env.shard_batch(batch)
        shard_shape = placed["latents"].sharding.shard_shape((8, 16, 4))
        assert shard_shape == (1, 16, 4)

    def test_shard_batch_replicates_stats_and_non_batch(self):
        """A per-channel stat whose length divides the dp shards (Wan
        latents_mean of 16 on 8 shards) must stay replicated, and with an
        explicit batch_size only true batch tensors get sharded."""
        env = MeshEnv(ParallelDims(dp_shard=8))
        batch = {
            "latents": np.zeros((8, 4, 2, 2), np.float32),
            "latents_mean": np.zeros((16,), np.float32),
            "lookup": np.zeros((16, 3), np.float32),  # non-batch, divisible dim-0
        }
        placed = env.shard_batch(batch, batch_size=8)
        assert placed["latents"].sharding.shard_shape((8, 4, 2, 2)) == (1, 4, 2, 2)
        assert placed["latents_mean"].sharding.is_fully_replicated
        assert placed["lookup"].sharding.is_fully_replicated

    def test_cp_seq_sharding(self):
        env = MeshEnv(ParallelDims(dp_shard=2, cp=4))
        sharding = env.data_sharding(3, seq_dim=1)
        x = jax.device_put(np.zeros((2, 8, 4), np.float32), sharding)
        assert x.sharding.shard_shape((2, 8, 4)) == (1, 2, 4)


class TestFsdpRules:
    def test_infer_largest_divisible_dim(self):
        assert infer_fsdp_spec((1024, 256), 8) == 0
        assert infer_fsdp_spec((100, 256), 8) == 1  # 100 not divisible by 8
        assert infer_fsdp_spec((30,), 8) is None  # small param -> replicate

    def test_make_param_shardings(self):
        env = MeshEnv(ParallelDims(dp_shard=8))
        params = {
            "dense": {"kernel": jnp.zeros((512, 256)), "bias": jnp.zeros((256,))},
        }
        shardings = make_param_shardings(params, env.mesh)
        assert shardings["dense"]["kernel"].spec == PartitionSpec("dp_shard", None)
        assert shardings["dense"]["bias"].spec == PartitionSpec(None)

    def test_tp_rule_composes_with_fsdp(self):
        env = MeshEnv(ParallelDims(dp_shard=4, tp=2))
        params = {"attn": {"q_proj": {"kernel": jnp.zeros((512, 768))}}}
        shardings = make_param_shardings(
            params, env.mesh, tp_rules=[(r"q_proj.kernel", PartitionSpec(None, "tp"))]
        )
        spec = shardings["attn"]["q_proj"]["kernel"].spec
        assert spec[1] == "tp"
        assert spec[0] == "dp_shard"

    def test_shard_pytree_places(self):
        env = MeshEnv(ParallelDims(dp_shard=8))
        params = {"w": np.ones((64, 16), np.float32)}
        shardings = make_param_shardings(params, env.mesh, min_weight_size=1)
        placed = shard_pytree(params, shardings)
        assert placed["w"].sharding.shard_shape((64, 16)) == (8, 16)


class TestTrainStepSemantics:
    """GSPMD derives DDP/FSDP collectives from shardings: a sharded-param grad step
    must equal the single-device result."""

    def test_fsdp_matmul_grad_matches_single_device(self):
        env = MeshEnv(ParallelDims(dp_shard=8))
        w = np.random.RandomState(0).rand(64, 32).astype(np.float32)
        x = np.random.RandomState(1).rand(16, 64).astype(np.float32)

        def loss(w, x):
            return jnp.sum((x @ w) ** 2)

        g_single = jax.grad(loss)(w, x)
        shardings = make_param_shardings({"w": w}, env.mesh, min_weight_size=1)
        w_sharded = jax.device_put(w, shardings["w"])
        x_sharded = jax.device_put(x, env.data_sharding(2))
        g_sharded = jax.jit(jax.grad(loss))(w_sharded, x_sharded)
        np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5, atol=1e-5)


class TestDeviceArrayLayout:
    def test_single_slice_layout_covers_all_devices(self):
        import jax

        from finetrainers_tpu.parallel.mesh import ParallelDims, _build_device_array

        devices = jax.devices()
        arr = _build_device_array(ParallelDims(dp_shard=4, cp=2), devices)
        assert arr.shape == (1, 1, 4, 2, 1)
        assert set(arr.ravel().tolist()) == set(devices)

    def test_unmappable_topology_falls_back_to_reshape(self):
        from finetrainers_tpu.parallel.mesh import ParallelDims, _build_device_array

        class FakeDev:
            def __init__(self, i, s):
                self.id = i
                self.slice_index = s

            def __repr__(self):
                return f"fake{self.id}"

        # 8 stub devices across 2 "slices": hybrid construction cannot work on
        # stubs, so the builder must fall back to the contiguous reshape.
        devices = [FakeDev(i, i // 4) for i in range(8)]
        arr = _build_device_array(ParallelDims(dp_replicate=2, dp_shard=4), devices)
        assert arr.shape == (1, 2, 4, 1, 1)
        assert [d.id for d in arr.ravel().tolist()] == list(range(8))


class TestDistReductions:
    def test_host_level_identities(self):
        import numpy as np

        from finetrainers_tpu.parallel.utils import dist_max, dist_mean, dist_reduce

        assert float(dist_mean([1.0, 3.0])) == 2.0
        assert float(dist_max([1.0, 3.0])) == 3.0
        assert float(dist_reduce([1.0, 3.0], op="sum")) == 4.0
        import pytest

        with pytest.raises(ValueError):
            dist_reduce(1.0, op="median")

    def test_inside_shard_map(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        from finetrainers_tpu.parallel.utils import dist_mean

        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))
        x = jnp.arange(8, dtype=jnp.float32)
        f = shard_map(lambda v: dist_mean(v, ("dp",)),
                      mesh=mesh, in_specs=P("dp"), out_specs=P("dp"))
        out = np.asarray(f(x))
        np.testing.assert_allclose(out, np.full(8, 3.5))


class TestAllGatherObject:
    def test_single_process_identity(self):
        from finetrainers_tpu.parallel.utils import all_gather_object

        obj = [{"type": "video", "path": "/x/a.mp4", "caption": None}]
        assert all_gather_object(obj) == [obj]

    def test_multi_process_pad_and_decode(self, monkeypatch):
        """Simulate 2 processes with uneven manifest sizes: the JSON byte
        padding/decoding must reconstruct each rank's object in process order
        (VERDICT r2 item 6 — validation artifact all-gather)."""
        import json

        import numpy as np

        import finetrainers_tpu.parallel.utils as pu

        rank_objs = [
            [{"type": "image", "path": "/r0/artifact-0-0.png"}],
            [{"type": "video", "path": "/r1/artifact-1-0.mp4", "caption": "longer caption here"}],
        ]
        current = {"idx": 0}

        class FakeMultihost:
            @staticmethod
            def process_allgather(arr):
                # Stack what each fake process WOULD contribute for this call.
                i = current["idx"]
                payloads = [
                    np.frombuffer(json.dumps(o).encode(), dtype=np.uint8) for o in rank_objs
                ]
                if arr.dtype == np.int64:  # length phase
                    return np.stack([np.array([p.size], np.int64) for p in payloads])
                max_len = max(p.size for p in payloads)
                out = np.zeros((2, max_len), np.uint8)
                for j, p in enumerate(payloads):
                    out[j, : p.size] = p
                return out

        monkeypatch.setattr(pu.jax, "process_count", lambda: 2)
        import jax.experimental.multihost_utils as mh

        monkeypatch.setattr(mh, "process_allgather", FakeMultihost.process_allgather)
        got = pu.all_gather_object(rank_objs[0])
        assert got == rank_objs
