#!/usr/bin/env python3
"""Gradio web UI for the restoration pipeline.

Equivalent of the reference's app.py (:144-348): image + optional mask
upload, four task checkboxes, fine-tuned vs pretrained-mode radio
(re-initializing the pipeline with the "nonexistent" sentinel, app.py:36-43),
a gallery of original -> per-step -> final results, demo examples, and
serving on 0.0.0.0:7860 (:353-357).

Gradio is an optional dependency; when absent this module still exposes
`process_image` for programmatic use and the CLI prints instructions.
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional

from PIL import Image

from image_restoration_and_enhancement_tpu.infer.pipeline import RestorationPipeline

logger = logging.getLogger(__name__)

_pipeline: Optional[RestorationPipeline] = None
_mode = "fine_tuned"

TASK_LABELS = [
    ("Denoise", "denoise"),
    ("Super-resolution x4", "sr_x4"),
    ("Colorize", "colorize"),
    ("Inpaint", "inpaint"),
]


def initialize_pipeline(mode: str = "fine_tuned") -> RestorationPipeline:
    """(Re)create the global pipeline; "pretrained" uses the reference's
    "nonexistent" sentinel so no fine-tuned checkpoints are loaded."""
    global _pipeline, _mode
    if _pipeline is not None and mode == _mode:
        return _pipeline
    config = None
    if mode == "pretrained":
        config = {name: {"fine_tuned_dir": "nonexistent"} for _, name in TASK_LABELS}
    _pipeline = RestorationPipeline(config=config)
    _mode = mode
    return _pipeline


def process_image(
    image: Image.Image,
    tasks: List[str],
    mask: Optional[Image.Image] = None,
    mode: str = "fine_tuned",
    **kwargs,
):
    """Run selected tasks; returns (gallery list of (image, caption), final)."""
    if image is None:
        return [], None
    pipe = initialize_pipeline(mode)
    results = pipe.process(image, tasks, mask=mask, **kwargs)
    order = ["original", "denoised", "super_resolved", "colorized", "inpainted", "final"]
    gallery = [(results[k], k) for k in order if k in results]
    return gallery, results["final"]


def create_interface():
    import gradio as gr

    with gr.Blocks(title="Image Restoration & Enhancement (TPU)") as demo:
        gr.Markdown("# Image Restoration & Enhancement — TPU-native")
        with gr.Row():
            with gr.Column():
                image_in = gr.Image(type="pil", label="Input image")
                mask_in = gr.Image(type="pil", label="Inpainting mask (optional)")
                task_boxes = gr.CheckboxGroup(
                    choices=[label for label, _ in TASK_LABELS],
                    value=["Denoise"],
                    label="Tasks (applied in order)",
                )
                mode = gr.Radio(
                    ["fine_tuned", "pretrained"], value="fine_tuned", label="Model mode"
                )
                btn = gr.Button("Restore", variant="primary")
            with gr.Column():
                gallery = gr.Gallery(label="Steps", columns=3)
                final = gr.Image(type="pil", label="Final")

        label_to_task = dict(TASK_LABELS)

        def _run(image, mask, labels, mode_v):
            tasks = [label_to_task[l] for l in labels]
            return process_image(image, tasks, mask=mask, mode=mode_v)

        btn.click(_run, [image_in, mask_in, task_boxes, mode], [gallery, final])

        demo_dir = os.path.join("data", "demo", "images")
        if os.path.isdir(demo_dir):
            examples = [
                [os.path.join(demo_dir, n)] for n in sorted(os.listdir(demo_dir))[:4]
            ]
            gr.Examples(examples=examples, inputs=[image_in])
    return demo


if __name__ == "__main__":
    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment. The pipeline is "
            "available programmatically via app.process_image / "
            "image_restoration_and_enhancement_tpu.infer.pipeline."
        )
    create_interface().launch(server_name="0.0.0.0", server_port=7860)
