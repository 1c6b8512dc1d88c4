"""CLI entry point. Parity with reference `train.py:14-80`: peeks --training_type
to pick the trainer config class, registers it into BaseArgs, parses, resolves the
ModelSpecification, instantiates the trainer, runs."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]

    # Honor JAX_PLATFORMS even when a sitecustomize pre-registered another
    # platform default (e.g. a TPU tunnel): lets the documented CPU dry run
    # (JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=N) work.
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from finetrainers_tpu.args import AttentionProviderArgs, BaseArgs
    from finetrainers_tpu.config import TrainingType, _get_model_specifiction_cls
    from finetrainers_tpu.logging import get_logger, set_dependency_log_level

    logger = get_logger("train")

    training_type = None
    if "--training_type" in argv:
        training_type = argv[argv.index("--training_type") + 1]

    args = BaseArgs()
    args.register_args(AttentionProviderArgs())

    if "--list_models" in argv:
        args.parse_args(argv)  # prints the registry and exits
        return None

    if training_type in (TrainingType.LORA, "lora"):
        from finetrainers_tpu.trainer.sft_trainer import SFTLowRankConfig

        args.register_args(SFTLowRankConfig())
        trainer_mode = "sft"
    elif training_type in (TrainingType.FULL_FINETUNE, "full-finetune"):
        from finetrainers_tpu.trainer.sft_trainer import SFTFullRankConfig

        args.register_args(SFTFullRankConfig())
        trainer_mode = "sft"
    elif training_type in (TrainingType.CONTROL_LORA, "control-lora"):
        from finetrainers_tpu.trainer.control_trainer import ControlLowRankConfig

        args.register_args(ControlLowRankConfig())
        trainer_mode = "control"
    elif training_type in (TrainingType.CONTROL_FULL_FINETUNE, "control-full-finetune"):
        from finetrainers_tpu.trainer.control_trainer import ControlFullRankConfig

        args.register_args(ControlFullRankConfig())
        trainer_mode = "control"
    else:
        raise ValueError(
            f"--training_type must be one of {[t.value for t in TrainingType]}, got {training_type!r}"
        )

    args.parse_args(argv)
    set_dependency_log_level(args.verbose)

    spec_cls = _get_model_specifiction_cls(args.model_name, training_type)
    model_specification = spec_cls(
        pretrained_model_name_or_path=args.pretrained_model_name_or_path,
        tokenizer_id=args.tokenizer_id,
        tokenizer_2_id=args.tokenizer_2_id,
        tokenizer_3_id=args.tokenizer_3_id,
        text_encoder_id=args.text_encoder_id,
        text_encoder_2_id=args.text_encoder_2_id,
        text_encoder_3_id=args.text_encoder_3_id,
        transformer_id=args.transformer_id,
        vae_id=args.vae_id,
        text_encoder_dtype=args.text_encoder_dtype,
        text_encoder_2_dtype=args.text_encoder_2_dtype,
        text_encoder_3_dtype=args.text_encoder_3_dtype,
        transformer_dtype=args.transformer_dtype,
        vae_dtype=args.vae_dtype,
        revision=args.revision,
        cache_dir=args.cache_dir,
    )

    if trainer_mode == "control":
        from finetrainers_tpu.trainer.control_trainer import ControlTrainer

        trainer = ControlTrainer(args, model_specification)
    else:
        from finetrainers_tpu.trainer.sft_trainer import SFTTrainer

        trainer = SFTTrainer(args, model_specification)
    trainer.run()
    return trainer


if __name__ == "__main__":
    main()
