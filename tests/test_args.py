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


# The reference CLI surface (finetrainers/args.py add_argument flags as of the
# surveyed revision), frozen here so the superset guarantee that docs/migration.md
# makes ("every reference flag parses") is enforced without the reference checkout.
REFERENCE_FLAGS = [
    "allow_tf32", "attn_provider_inference", "attn_provider_training", "batch_size",
    "beta1", "beta2", "beta3", "cache_dir", "checkpointing_limit", "checkpointing_steps",
    "compile_modules", "compile_scopes", "cp_degree", "dataloader_num_workers",
    "dataset_config", "dataset_shuffle_buffer_size", "dp_degree", "dp_shards",
    "enable_model_cpu_offload", "enable_precomputation", "enable_slicing",
    "enable_tiling", "epsilon", "float32_matmul_precision", "flow_base_seq_len",
    "flow_base_shift", "flow_logit_mean", "flow_logit_std", "flow_max_seq_len",
    "flow_max_shift", "flow_mode_scale", "flow_resolution_shifting", "flow_shift",
    "flow_weighting_scheme", "gradient_accumulation_steps", "gradient_checkpointing",
    "hub_model_id", "hub_token", "init_timeout", "layerwise_upcasting_modules",
    "layerwise_upcasting_skip_modules_pattern", "layerwise_upcasting_storage_dtype",
    "list_models", "logging_dir", "logging_steps", "lr", "lr_num_cycles", "lr_power",
    "lr_scheduler", "lr_warmup_steps", "max_data_samples", "max_grad_norm",
    "model_name", "nccl_timeout", "optimizer", "output_dir", "parallel_backend",
    "pin_memory", "pp_degree", "precomputation_dir", "precomputation_items",
    "precomputation_once", "precomputation_reuse", "pretrained_model_name_or_path",
    "push_to_hub", "report_to", "resume_from_checkpoint", "revision", "seed",
    "text_encoder_2_dtype", "text_encoder_2_id", "text_encoder_3_dtype",
    "text_encoder_3_id", "text_encoder_dtype", "text_encoder_id", "tokenizer_2_id",
    "tokenizer_3_id", "tokenizer_id", "tp_degree", "tracker_name", "train_steps",
    "training_type", "transformer_dtype", "transformer_id", "vae_dtype", "vae_id",
    "validation_dataset_file", "validation_steps", "variant", "verbose",
    "weight_decay",
]


class TestReferenceFlagSuperset:
    def test_every_reference_flag_parses(self):
        import argparse

        from finetrainers_tpu.args import _add_args

        parser = argparse.ArgumentParser()
        _add_args(parser)
        AttentionProviderArgs().add_args(parser)
        ours = {a.lstrip("-") for action in parser._actions for a in action.option_strings}
        missing = sorted(set(REFERENCE_FLAGS) - ours)
        assert not missing, f"reference CLI flags missing from BaseArgs: {missing}"
