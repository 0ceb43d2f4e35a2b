"""End-to-end importer rehearsal on a FAKE diffusers-layout directory.

VERDICT r3 #5: without real SD1.5 weights in this air-gapped env, the
importer risk that IS testable is name-map/layout drift. These tests build
a fake diffusers checkout (random weights, real names/shapes/formats:
torch-format safetensors, transformers-generated text-encoder state dict,
tokenizer BPE assets, scheduler_config.json) and prove the one-command
path `import_sd_dir` -> serve -> goldens round-trips byte-stable — so the
day a weights-available env appears, the real import is a rehearsed
one-command parity check (scripts/import_weights.py docstring).

Reference being rehearsed: the from_pretrained loads in
/root/reference/src/inference.py:139-197 (every component incl. scheduler
config + tokenizer assets).
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import import_weights as iw  # noqa: E402

from image_restoration_and_enhancement_tpu import config as C
from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt
from image_restoration_and_enhancement_tpu.core import sampling
from image_restoration_and_enhancement_tpu.models import tokenizer as tok


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
    """(fake diffusers dir, its config, imported pipeline dir)."""
    src = str(tmp_path_factory.mktemp("hf") / "sd15-fake")
    cfg = iw.make_rehearsal_dir(src, seed=0)
    dst = str(tmp_path_factory.mktemp("imported") / "sd15")
    iw.import_sd_dir(src, dst, cfg)
    return src, cfg, dst


def test_fake_dir_has_diffusers_layout(rehearsal):
    src, _, _ = rehearsal
    for rel in (
        "model_index.json",
        "unet/diffusion_pytorch_model.safetensors",
        "unet/config.json",
        "vae/diffusion_pytorch_model.safetensors",
        "vae/config.json",
        "text_encoder/model.safetensors",
        "text_encoder/config.json",
        "tokenizer/vocab.json",
        "tokenizer/merges.txt",
        "scheduler/scheduler_config.json",
    ):
        assert os.path.exists(os.path.join(src, rel)), rel


def test_exported_names_are_canonical_diffusers(rehearsal):
    """Pin the UNet/VAE name map against hand-pinned canonical diffusers
    SD key names — the drift this rehearsal exists to catch. The text
    encoder needs no pinning here: its state dict comes from the REAL
    transformers library (test_cross_framework pins output parity)."""
    src, _, _ = rehearsal
    unet = set(ckpt.load_torch_safetensors(
        os.path.join(src, "unet", "diffusion_pytorch_model.safetensors")))
    for name in (
        "conv_in.weight",
        "conv_in.bias",
        "time_embedding.linear_1.weight",
        "time_embedding.linear_2.bias",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.resnets.0.conv1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "down_blocks.1.resnets.0.conv_shortcut.weight",
        "mid_block.resnets.0.conv1.weight",
        "mid_block.attentions.0.transformer_blocks.0.norm3.weight",
        "up_blocks.0.resnets.0.conv_shortcut.weight",
        "conv_norm_out.weight",
        "conv_out.weight",
    ):
        assert name in unet, f"missing canonical UNet key {name}"
    # attention projections carry no bias in SD's UNet
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.bias" \
        not in unet
    # conv kernels are torch OIHW
    import safetensors.numpy as st_numpy
    arrs = st_numpy.load_file(
        os.path.join(src, "unet", "diffusion_pytorch_model.safetensors"))
    k = arrs["down_blocks.0.resnets.0.conv1.weight"]
    assert k.ndim == 4 and k.shape[2:] == (3, 3), k.shape

    vae = set(ckpt.load_torch_safetensors(
        os.path.join(src, "vae", "diffusion_pytorch_model.safetensors")))
    for name in (
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.conv1.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "encoder.conv_norm_out.weight",
        "encoder.conv_out.weight",
        "decoder.conv_in.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "decoder.mid_block.attentions.0.to_out.0.weight",
        "decoder.conv_out.weight",
        "quant_conv.weight",
        "post_quant_conv.weight",
    ):
        assert name in vae, f"missing canonical VAE key {name}"


def test_import_covers_every_component(rehearsal):
    src, cfg, dst = rehearsal
    # all three weight components imported + tokenizer assets alongside
    for rel in ("unet/model.safetensors", "vae/model.safetensors",
                "text_encoder/model.safetensors", "vocab.json", "merges.txt",
                "model_index.json"):
        assert os.path.exists(os.path.join(dst, rel)), rel

    # the text tower round-trips the REAL transformers state dict exactly
    hf_state = ckpt.load_torch_safetensors(
        os.path.join(src, "text_encoder", "model.safetensors"))
    imported = ckpt.load_params(
        os.path.join(dst, "text_encoder", "model.safetensors"))
    emb = np.asarray(imported["token_embedding"]["embedding"])
    np.testing.assert_array_equal(
        emb, hf_state["text_model.embeddings.token_embedding.weight"])
    q = np.asarray(imported["layers_0"]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_array_equal(
        q, hf_state["text_model.encoder.layers.0.self_attn.q_proj.weight"].T)


def test_scheduler_config_wins_over_defaults(tmp_path):
    """A source checkpoint with non-default scheduler values must serve
    with THOSE values: import reads scheduler/scheduler_config.json and
    bakes it into the saved pipeline's model config."""
    import dataclasses

    src = str(tmp_path / "fake")
    custom_sched = dataclasses.replace(
        C.SD15_SCHEDULER, beta_end=0.011, steps_offset=0,
        beta_schedule="linear")
    cfg = iw.make_rehearsal_dir(
        src, config=dataclasses.replace(C.TINY_SD, scheduler=custom_sched))
    dst = str(tmp_path / "imported")
    # import with DEFAULT scheduler in the passed config: the source
    # dir's scheduler_config.json must still win
    iw.import_sd_dir(
        src, dst, dataclasses.replace(cfg, scheduler=C.SD15_SCHEDULER))
    loaded = ckpt.load_pipeline_model_config(dst)
    assert loaded.scheduler.beta_end == pytest.approx(0.011)
    assert loaded.scheduler.steps_offset == 0
    assert loaded.scheduler.beta_schedule == "linear"
    # untouched fields keep their values
    assert loaded.scheduler.num_train_timesteps == 1000


def test_imported_pipeline_serves_and_goldens_roundtrip(rehearsal, tmp_path):
    """import -> tokenizer -> text encode -> img2img serve; then the
    parity probes are byte-stable across runs on the imported dir (the
    --record_goldens/--check_goldens contract)."""
    _, cfg, dst = rehearsal
    tokenizer = tok.CLIPTokenizer.from_dir(dst)
    ids = tokenizer(["denoise the image", ""], max_length=77)
    assert ids.shape == (2, 77)
    assert ids.max() < cfg.text_encoder.vocab_size

    modules = sampling.SDModules.create(cfg, dtype=jnp.float32,
                                        attention_backend="xla")
    params = ckpt.load_pipeline(dst)
    ctx = sampling.encode_text(modules, params, jnp.asarray(ids))
    fn = sampling.make_img2img_fn(modules, 2, 0.8, 5.0, sampler="ddim")
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                             minval=-1.0, maxval=1.0)
    out = fn(params, img, ctx, ctx, jax.random.PRNGKey(2))
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    probes1 = iw.run_our_probes(dst, config=cfg, image_size=64)
    gpath = tmp_path / "goldens.npz"
    np.savez_compressed(gpath, **probes1)
    ref = dict(np.load(gpath))
    probes2 = iw.run_our_probes(dst, config=cfg, image_size=64)
    for name in probes1:
        np.testing.assert_array_equal(probes2[name], ref[name])


def test_inpaint_variant_import(tmp_path):
    """The 9-channel inpaint UNet imports through the same path (the
    reference's second pipeline, src/inference.py:171-197)."""
    src = str(tmp_path / "fake-inpaint")
    cfg = iw.make_rehearsal_dir(src, config=C.TINY_SD_INPAINT)
    dst = str(tmp_path / "imported-inpaint")
    iw.import_sd_dir(src, dst, cfg)
    params = ckpt.load_pipeline(dst)
    k = np.asarray(params["unet"]["conv_in"]["kernel"])
    assert k.shape[2] == 9, k.shape  # HWIO: 9 input channels
    with open(os.path.join(src, "unet", "config.json")) as f:
        assert json.load(f)["in_channels"] == 9
