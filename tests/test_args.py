"""Args system tests: CLI-surface compatibility with the reference."""

import jax.numpy as jnp
import pytest

from finetrainers_tpu.args import AttentionProviderArgs, BaseArgs


MINIMAL = ["--pretrained_model_name_or_path", "some/model", "--dataset_config", "data.json"]


class TestBaseArgs:
    def test_defaults(self):
        args = BaseArgs().parse_args(MINIMAL)
        assert args.batch_size == 1
        assert args.train_steps == 1000
        assert args.lr == 1e-4
        assert args.transformer_dtype == jnp.bfloat16
        assert args.parallel_backend == "jax"

    def test_dtype_mapping(self):
        args = BaseArgs().parse_args(MINIMAL + ["--transformer_dtype", "fp32", "--vae_dtype", "fp16"])
        assert args.transformer_dtype == jnp.float32
        assert args.vae_dtype == jnp.float16

    def test_parallel_degrees(self):
        args = BaseArgs().parse_args(MINIMAL + ["--dp_degree", "2", "--dp_shards", "4", "--cp_degree", "1"])
        assert args.dp_degree == 2 and args.dp_shards == 4

    def test_pp_composition(self):
        # pp>1 is accepted (trained GPipe path, beyond the reference) and
        # composes with dp/cp/tp (the pipeline shard_map is manual over pp+dp
        # only; cp/tp stay GSPMD-auto — parallel/pipeline.py).
        args = BaseArgs().parse_args(MINIMAL + ["--pp_degree", "2"])
        assert args.pp_degree == 2
        args = BaseArgs().parse_args(MINIMAL + ["--pp_degree", "2", "--cp_degree", "2"])
        assert args.pp_degree == 2 and args.cp_degree == 2
        args = BaseArgs().parse_args(MINIMAL + ["--pp_degree", "2", "--tp_degree", "2"])
        assert args.pp_degree == 2 and args.tp_degree == 2
        with pytest.raises(ValueError):
            BaseArgs().parse_args(
                MINIMAL + ["--pp_degree", "2", "--batch_size", "4", "--pp_microbatches", "3"]
            )

    def test_flow_args(self):
        args = BaseArgs().parse_args(MINIMAL + ["--flow_weighting_scheme", "logit_normal", "--flow_shift", "3.0"])
        assert args.flow_weighting_scheme == "logit_normal"
        assert args.flow_shift == 3.0

    def test_to_dict_groups(self):
        args = BaseArgs().parse_args(MINIMAL)
        d = args.to_dict()
        assert "training_arguments" in d and "optimizer_arguments" in d
        assert d["model_arguments"]["transformer_dtype"] == "bf16"

    def test_registered_group_delegation(self):
        args = BaseArgs()
        group = AttentionProviderArgs()
        args.register_args(group)
        args.parse_args(MINIMAL + ["--attn_provider_training", "transformer:flash"])
        assert args.attn_provider_training == ["transformer:flash"]

    def test_invalid_attention_provider(self):
        args = BaseArgs()
        args.register_args(AttentionProviderArgs())
        with pytest.raises(ValueError):
            args.parse_args(MINIMAL + ["--attn_provider_training", "transformer:cuda_flash"])
