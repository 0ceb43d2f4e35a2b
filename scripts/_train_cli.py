"""Shared CLI for the four per-task training scripts.

Argument surface mirrors the reference trainers (train_denoising.py:930-965)
so existing invocations translate directly; the implementation is the single
generic TPU trainer (train/trainer.py).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser(task: str, default_output: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=f"Fine-tune Stable Diffusion for {task} (TPU)")
    p.add_argument("--data_root", default="data/pairs",
                   help="Root of the pair layout data/pairs/{task}/{split}")
    p.add_argument("--output_dir", default=default_output)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=5e-6)
    p.add_argument("--lambda_img", type=float, default=0.05)
    p.add_argument("--gradient_accumulation_steps", type=int, default=8)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--resume", action="store_true",
                   help="Resume from the orbax train state (exact resume, "
                        "including optimizer state)")
    p.add_argument("--init_from", default=None,
                   help="Pipeline checkpoint (ours) or diffusers torch dir to "
                        "initialize weights from")
    p.add_argument("--vae_init", default=None,
                   help="Pipeline checkpoint to seed the FROZEN components "
                        "(VAE / text towers) from — e.g. the output of "
                        "scripts/pretrain_vae.py. The UNet stays random (or "
                        "comes from --init_from).")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--max_val_samples", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_mesh", action="store_true", help="Disable data-parallel mesh")
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "adafactor"],
                   help="adamw = reference recipe; adafactor = memory-lean "
                        "(fits single 16GB chips at 256px batch 8)")
    p.add_argument("--nan_guard", default="apply_if_finite",
                   choices=["apply_if_finite", "zero_grads"])
    p.add_argument("--state_save_epochs", type=int, default=5,
                   help="Orbax train-state (exact resume) save cadence in "
                        "epochs; the final epoch is always saved. 0 = final "
                        "only, -1 = never (weights-only throwaway runs on "
                        "slow disk). The state is ~3.2GiB for the 860M UNet.")
    p.add_argument("--val_strength", type=float, default=None,
                   help="Override the task's validation sampler strength "
                        "(e.g. 0.1 for the hard-degradation runs: the "
                        "demo-measured serving point where output PSNR "
                        "beats the degraded input, docs/artifacts/"
                        "demo_learning_v2)")
    p.add_argument("--val_steps", type=int, default=None,
                   help="Override the task's validation sampler step count")
    p.add_argument("--val_guidance", type=float, default=None,
                   help="Override the task's validation guidance scale")
    p.add_argument("--base_model", default="sd15",
                   choices=["sd15", "sdxl", "tiny_sd", "tiny_sdxl"],
                   help="Model stack to fine-tune (reference --base_model, "
                        "train_denoising.py:950,:531-594; tiny_* are the "
                        "test configs). The inpaint task forces the 9-ch "
                        "SD1.5 inpaint UNet when sd15 is selected.")
    return p


def resolve_model_config(base_model: str, task: str):
    """Map the --base_model choice to an SDModelConfig (None = task default,
    which is the SD1.5 stack from tasks/registry.py)."""
    from image_restoration_and_enhancement_tpu import config as C

    if base_model == "sd15":
        return None
    return {"sdxl": C.SDXL, "tiny_sd": C.TINY_SD, "tiny_sdxl": C.TINY_SDXL}[base_model]


def run(task: str, default_output: str) -> None:
    args = build_parser(task, default_output).parse_args()

    from image_restoration_and_enhancement_tpu.train.loop import TrainConfig
    from image_restoration_and_enhancement_tpu.train.trainer import train_task

    task_spec = None
    if any(v is not None for v in (args.val_strength, args.val_steps,
                                   args.val_guidance)):
        import dataclasses

        from image_restoration_and_enhancement_tpu.tasks.registry import get_task

        spec = get_task(task)
        vs = spec.val_sampler or spec.sampler
        vs = dataclasses.replace(
            vs,
            strength=vs.strength if args.val_strength is None else args.val_strength,
            num_inference_steps=(vs.num_inference_steps if args.val_steps is None
                                 else args.val_steps),
            guidance_scale=(vs.guidance_scale if args.val_guidance is None
                            else args.val_guidance),
        )
        task_spec = dataclasses.replace(spec, val_sampler=vs)

    cfg = TrainConfig(
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        lambda_img=args.lambda_img,
        image_size=args.image_size,
        seed=args.seed,
        save_steps=args.save_steps,
        optimizer=args.optimizer,
        nan_guard=args.nan_guard,
        state_save_epochs=args.state_save_epochs,
    )
    metrics = train_task(
        task,
        data_root=args.data_root,
        output_dir=args.output_dir,
        cfg=cfg,
        init_from=args.init_from,
        vae_init=args.vae_init,
        max_train_samples=args.max_train_samples,
        max_val_samples=args.max_val_samples,
        use_mesh=not args.no_mesh,
        resume=args.resume,
        model_config=resolve_model_config(args.base_model, task),
        task_spec=task_spec,
    )
    print({k: round(v, 4) for k, v in metrics.items()})
