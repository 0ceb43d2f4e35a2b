"""Weights-import parity harness (scripts/import_weights.py).

Full cross-framework parity needs the real SD1.5 torch artifacts (absent in
this air-gapped env — those paths are exercised on a weights-available
machine); here we pin the harness machinery itself: probes are
deterministic, goldens round-trip, and deltas gate correctly.
"""
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


@pytest.fixture(scope="module")
def tiny_pipeline_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pretrained") / "sd15")
    modules = sampling.SDModules.create(C.TINY_SD, dtype=jnp.float32)
    params = sampling.init_params(modules, jax.random.PRNGKey(0), image_size=64)
    ckpt.save_pipeline(d, params, C.TINY_SD)
    return d


def test_probes_deterministic_and_goldens_roundtrip(tiny_pipeline_dir, tmp_path):
    out1 = iw.run_our_probes(tiny_pipeline_dir, config=C.TINY_SD, image_size=64)
    assert set(out1) == {"text_encoder", "vae_encode", "vae_decode", "unet",
                        "img2img"}
    for name, arr in out1.items():
        assert np.isfinite(arr).all(), name

    gpath = tmp_path / "g.npz"
    np.savez_compressed(gpath, **out1)
    ref = dict(np.load(gpath))
    out2 = iw.run_our_probes(tiny_pipeline_dir, config=C.TINY_SD, image_size=64)
    for name in out1:
        np.testing.assert_array_equal(out2[name], ref[name]), name


def test_perturbed_weights_fail_gate(tiny_pipeline_dir, tmp_path):
    """A corrupted weight must push the per-module delta past the gate —
    the harness actually detects import errors, not just runs."""
    base = iw.run_our_probes(tiny_pipeline_dir, config=C.TINY_SD, image_size=64)
    params = ckpt.load_pipeline(tiny_pipeline_dir)
    # perturb one UNet kernel like a transposed/wrong import would
    leaves, treedef = jax.tree.flatten(params["unet"])
    leaves[0] = leaves[0] + 0.05
    params["unet"] = jax.tree.unflatten(treedef, leaves)
    d2 = str(tmp_path / "bad")
    ckpt.save_pipeline(d2, params, C.TINY_SD)
    bad = iw.run_our_probes(d2, config=C.TINY_SD, image_size=64)
    delta = float(np.abs(bad["unet"] - base["unet"]).max())
    assert delta > iw.THRESHOLDS["unet"], delta


@pytest.mark.skipif(
    not os.environ.get("IRET_SD15_TORCH_DIR"),
    reason="real SD1.5 torch weights not available in this env",
)
def test_real_sd15_parity(tmp_path):
    """On a weights-available machine: import the real pipeline and assert
    per-module parity vs diffusers outputs."""
    sd_dir = os.environ["IRET_SD15_TORCH_DIR"]
    out = str(tmp_path / "sd15")
    iw.import_sd_dir(sd_dir, out, C.SD15)
    ours = iw.run_our_probes(out)
    torch_out = iw.run_torch_probes(sd_dir)
    assert torch_out, "torch/diffusers must be importable for this test"
    for name in ("text_encoder", "vae_encode", "vae_decode", "unet"):
        d = float(np.abs(ours[name] - torch_out[f"{name}_torch"]).max())
        assert d <= iw.THRESHOLDS[name], (name, d)
