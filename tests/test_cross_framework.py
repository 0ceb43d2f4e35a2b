"""Cross-framework parity vs REAL HuggingFace transformers (torch, CPU).

VERDICT r1 flagged that our correctness tests were self-referential
(expectations derived from reading upstream source, not captured from an
upstream run). `diffusers` is not installed in this env, but `transformers`
IS — so the CLIP text encoder and the BPE tokenizer can be pinned against
the genuine upstream implementation end to end:

- text encoder: random-init `transformers.CLIPTextModel` -> state_dict ->
  our torch importer (core/checkpoint.py) -> our Flax CLIPTextModel must
  reproduce last_hidden_state / penultimate / pooled output numerically.
  This exercises the exact key-translation + transpose path used for real
  SD1.5 checkpoints (reference loads this component at
  /root/reference/scripts/train_denoising.py:219 via the SD pipeline).
- tokenizer: a synthetic vocab.json/merges.txt loaded by BOTH
  `transformers.CLIPTokenizer` and our pure-Python BPE must produce
  identical [B, 77] id arrays on the framework's real task prompts
  (reference tokenizer assets: outputs/models/*/best/tokenizer/).
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from image_restoration_and_enhancement_tpu import config as C  # noqa: E402
from image_restoration_and_enhancement_tpu.core import checkpoint as ckpt  # noqa: E402
from image_restoration_and_enhancement_tpu.models import tokenizer as tok  # noqa: E402
from image_restoration_and_enhancement_tpu.models.clip_text import (  # noqa: E402
    CLIPTextModel,
)

# small enough for CPU, large enough that a transposed/mis-mapped weight
# cannot cancel out. Token-id layout mirrors the real CLIP vocab: eos is
# the LARGEST id (49407 upstream). That matters: transformers keeps a
# legacy pooling path (`input_ids.argmax(-1)`) for configs with the
# pre-#24773 `eos_token_id == 2`, which only coincides with "first eos
# position" because eos is the max id; with eos != 2 it pools at the first
# eos position — exactly our implementation's semantics.
_CFG = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    max_position_embeddings=77,
    bos_token_id=510,
    eos_token_id=511,
    pad_token_id=511,
)


def _torch_text_model():
    cfg = transformers.CLIPTextConfig(
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
        attn_implementation="eager", **_CFG,
    )
    torch.manual_seed(0)
    m = transformers.CLIPTextModel(cfg)
    m.eval()
    return m


def test_clip_text_encoder_parity_vs_transformers():
    tm = _torch_text_model()
    sd = {
        k: v.detach().numpy()
        for k, v in tm.state_dict().items()
        if "position_ids" not in k
    }
    params = ckpt.import_torch_state_dict(sd)

    ours = CLIPTextModel(C.CLIPTextConfig(**_CFG))
    rng = np.random.RandomState(0)
    ids = rng.randint(3, 510, size=(2, 77)).astype(np.int32)
    ids[:, 0] = _CFG["bos_token_id"]
    ids[0, 10] = _CFG["eos_token_id"]  # eos mid-sequence: pools there
    ids[0, 11:] = _CFG["pad_token_id"]  # pad == eos, SD convention
    ids[1, 76] = _CFG["eos_token_id"]

    with torch.no_grad():
        ref = tm(torch.from_numpy(ids.astype(np.int64)),
                 output_hidden_states=True)
    out = ours.apply({"params": params}, ids, return_dict=True)

    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4,
    )
    # SDXL consumes the PRE-final-LN penultimate layer (hidden_states[-2])
    np.testing.assert_allclose(
        np.asarray(out["penultimate_hidden_state"]),
        ref.hidden_states[-2].numpy(), atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooled"]), ref.pooler_output.numpy(),
        atol=2e-5, rtol=1e-4,
    )


def test_clip_importer_detects_corruption():
    """The same parity pipeline must FAIL when a torch weight is perturbed
    the way a transpose/mis-map bug would — guards against a vacuously
    tolerant gate."""
    tm = _torch_text_model()
    sd = {
        k: v.detach().numpy()
        for k, v in tm.state_dict().items()
        if "position_ids" not in k
    }
    key = "text_model.encoder.layers.1.self_attn.q_proj.weight"
    sd[key] = sd[key].T  # simulate a missed transpose
    params = ckpt.import_torch_state_dict(sd)
    ours = CLIPTextModel(C.CLIPTextConfig(**_CFG))
    ids = np.full((1, 77), 5, np.int32)
    ids[:, 0], ids[:, -1] = _CFG["bos_token_id"], _CFG["eos_token_id"]
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids.astype(np.int64))).last_hidden_state
    out = ours.apply({"params": params}, ids)
    assert float(np.abs(np.asarray(out) - ref.numpy()).max()) > 1e-2


# --------------------------------------------------------------------------
# Tokenizer parity
# --------------------------------------------------------------------------


def _build_bpe_assets(tmpdir: str):
    """Synthetic-but-real BPE assets both tokenizers can load: the 256
    byte-unicode symbols, their </w> forms, a merge table that actually
    fires on English prompt text, and the CLIP special tokens."""
    b2u = tok._bytes_to_unicode()
    base = [b2u[i] for i in sorted(b2u)]
    merges = [
        ("t", "h"), ("th", "e</w>"), ("i", "n"), ("r", "e"), ("o", "n"),
        ("a", "n"), ("e", "r"), ("s", "t"), ("e", "n"), ("o", "r"),
        ("a", "l"), ("d", "e"), ("de", "n"), ("den", "o"), ("deno", "i"),
        ("denoi", "s"), ("denois", "e</w>"), ("i", "m"), ("im", "a"),
        ("ima", "g"), ("imag", "e</w>"), ("c", "o"), ("co", "l"),
        ("col", "or"), ("q", "u"), ("qu", "al"), ("i", "t"), ("it", "y</w>"),
        ("h", "i"), ("hi", "g"), ("hig", "h</w>"), ("r", "es"),
        ("e", "s"), ("o", "t"), ("ot", "o</w>"), ("p", "h"), ("ph", "ot"),
    ]
    vocab = {}
    for i, s in enumerate(base):
        vocab[s] = len(vocab)
    for s in base:
        vocab[s + "</w>"] = len(vocab)
    for a, b in merges:
        m = a + b
        if m not in vocab:
            vocab[m] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    with open(os.path.join(tmpdir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tmpdir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return tmpdir


def test_tokenizer_parity_vs_transformers(tmp_path):
    d = _build_bpe_assets(str(tmp_path))
    theirs = transformers.CLIPTokenizer(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt"),
    )
    ours = tok.CLIPTokenizer.from_dir(d)

    from image_restoration_and_enhancement_tpu.tasks import registry

    prompts = [spec.prompt for spec in registry.TASKS.values()]
    prompts += [
        "a high quality photo, denoise, 4k!",
        "colorize   this  IMAGE  please",
        "restore; enhance: the photo's quality (now)",
        "",
    ]
    ref_ids = theirs(
        prompts, padding="max_length", truncation=True, max_length=77,
        return_tensors="np",
    )["input_ids"]
    got = ours(prompts, max_length=77)
    np.testing.assert_array_equal(got, ref_ids.astype(np.int32))


def test_tokenizer_roundtrip_decode(tmp_path):
    d = _build_bpe_assets(str(tmp_path))
    ours = tok.CLIPTokenizer.from_dir(d)
    text = "denoise the image"
    ids = [i for i in ours(text)[0] if i not in (ours.bos_id, ours.pad_id)]
    assert ours.decode(ids) == text


# --------------------------------------------------------------------------
# Op-level goldens vs torch functional ops
# --------------------------------------------------------------------------


def test_group_norm_matches_torch_functional():
    """Our lane-friendly two-stage GroupNorm (ops/groupnorm.py) vs
    torch.nn.functional.group_norm — the exact op diffusers ResnetBlock2D
    uses. NHWC here, NCHW there."""
    from image_restoration_and_enhancement_tpu.ops import groupnorm as gn

    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 6, 64).astype(np.float32) * 3 + 1.5
    w = rng.randn(64).astype(np.float32) * 0.2 + 1.0
    b = rng.randn(64).astype(np.float32) * 0.2

    ours = np.asarray(gn.group_norm(x, w, b, groups=16, eps=1e-5))
    ref = torch.nn.functional.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 16,
        torch.from_numpy(w), torch.from_numpy(b), eps=1e-5,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_group_norm_silu_matches_torch():
    from image_restoration_and_enhancement_tpu.ops import groupnorm as gn

    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 4, 32).astype(np.float32)
    w = np.ones(32, np.float32)
    b = np.zeros(32, np.float32)
    ours = np.asarray(gn.group_norm(x, w, b, groups=8, eps=1e-6, act="silu"))
    t = torch.nn.functional.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 8, eps=1e-6)
    ref = torch.nn.functional.silu(t).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_asymmetric_vae_downsample_pad_matches_torch():
    """The VAE encoder downsample uses asymmetric (0,1) padding
    (diffusers Downsample2D pad=(0,1,0,1)); pin our conv arrangement
    against torch's F.pad + stride-2 conv."""
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(2)
    x = rng.randn(1, 9, 9, 8).astype(np.float32)
    w = (rng.randn(3, 3, 8, 16) * 0.1).astype(np.float32)

    ours = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), ((0, 1), (0, 1)),
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
    )
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
    ref = torch.nn.functional.conv2d(
        xt, torch.from_numpy(w.transpose(3, 2, 0, 1)), stride=2,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_lpips_importer_and_distance_vs_torch_replica():
    """Build the torchvision-AlexNet feature trunk in torch, run the LPIPS
    math (scaling layer, unit-normalized feature diffs, learned 1x1 lin
    heads, spatial mean, layer sum) exactly as the `lpips` package does,
    and require our importer + Flax LPIPSAlex to reproduce the distance.
    Pins conv/pool padding semantics and the state-dict name mapping
    (reference metric: /root/reference/src/metrics.py:97-111)."""
    from image_restoration_and_enhancement_tpu.metrics import perceptual as P

    torch.manual_seed(0)
    feats = torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 11, stride=4, padding=2), torch.nn.ReLU(),
        torch.nn.MaxPool2d(3, 2),
        torch.nn.Conv2d(64, 192, 5, padding=2), torch.nn.ReLU(),
        torch.nn.MaxPool2d(3, 2),
        torch.nn.Conv2d(192, 384, 3, padding=1), torch.nn.ReLU(),
        torch.nn.Conv2d(384, 256, 3, padding=1), torch.nn.ReLU(),
        torch.nn.Conv2d(256, 256, 3, padding=1), torch.nn.ReLU(),
    ).eval()
    chans = [64, 192, 384, 256, 256]
    lins = [torch.rand(1, c, 1, 1) * 0.1 for c in chans]

    state = {}
    for i, m in enumerate(feats):
        if isinstance(m, torch.nn.Conv2d):
            state[f"net.features.{i}.weight"] = m.weight.detach().numpy()
            state[f"net.features.{i}.bias"] = m.bias.detach().numpy()
    for n, w in enumerate(lins):
        state[f"lins.{n}.model.1.weight"] = w.numpy()
    params = P.import_lpips_torch_state(state)

    rng = np.random.RandomState(0)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    ours = np.asarray(P.LPIPSAlex().apply({"params": params}, a, b))

    def torch_taps(x):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        h = (torch.from_numpy(x.transpose(0, 3, 1, 2)) - shift) / scale
        taps = []
        for m in feats:
            h = m(h)
            if isinstance(m, torch.nn.ReLU):
                taps.append(h)
        return taps

    with torch.no_grad():
        ta, tb = torch_taps(a), torch_taps(b)
        ref = torch.zeros(2)
        for xa, xb, w in zip(ta, tb, lins):
            na = xa / (xa.square().sum(1, keepdim=True).sqrt() + 1e-10)
            nb = xb / (xb.square().sum(1, keepdim=True).sqrt() + 1e-10)
            diff = (na - nb) ** 2
            ref = ref + (w.abs() * diff).sum(1).mean((1, 2))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4, rtol=1e-3)


def test_rrdbnet_importer_vs_torch_replica():
    """Hand-built torch Real-ESRGAN RRDBNet (exact upstream naming:
    conv_first, body.N.rdbM.convK, conv_body, conv_up1/2, conv_hr,
    conv_last) -> our importer -> Flax forward must match the torch
    forward. Catches name-mapping bugs the round-trip tests can't."""
    from image_restoration_and_enhancement_tpu.models import rrdbnet as R

    F_, G, B = 16, 8, 2  # features, growth, blocks (tiny for CPU)

    class TDense(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for i in range(1, 5):
                setattr(self, f"conv{i}",
                        torch.nn.Conv2d(F_ + (i - 1) * G, G, 3, padding=1))
            self.conv5 = torch.nn.Conv2d(F_ + 4 * G, F_, 3, padding=1)

        def forward(self, x):
            l = torch.nn.functional.leaky_relu
            c1 = l(self.conv1(x), 0.2)
            c2 = l(self.conv2(torch.cat([x, c1], 1)), 0.2)
            c3 = l(self.conv3(torch.cat([x, c1, c2], 1)), 0.2)
            c4 = l(self.conv4(torch.cat([x, c1, c2, c3], 1)), 0.2)
            c5 = self.conv5(torch.cat([x, c1, c2, c3, c4], 1))
            return x + 0.2 * c5

    class TRRDB(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.rdb1, self.rdb2, self.rdb3 = TDense(), TDense(), TDense()

        def forward(self, x):
            return x + 0.2 * self.rdb3(self.rdb2(self.rdb1(x)))

    class TNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = torch.nn.Conv2d(3, F_, 3, padding=1)
            self.body = torch.nn.Sequential(*[TRRDB() for _ in range(B)])
            self.conv_body = torch.nn.Conv2d(F_, F_, 3, padding=1)
            self.conv_up1 = torch.nn.Conv2d(F_, F_, 3, padding=1)
            self.conv_up2 = torch.nn.Conv2d(F_, F_, 3, padding=1)
            self.conv_hr = torch.nn.Conv2d(F_, F_, 3, padding=1)
            self.conv_last = torch.nn.Conv2d(F_, 3, 3, padding=1)

        def forward(self, x):
            l = torch.nn.functional.leaky_relu
            up = lambda v: torch.nn.functional.interpolate(v, scale_factor=2,
                                                           mode="nearest")
            feat = self.conv_first(x)
            feat = feat + self.conv_body(self.body(feat))
            feat = l(self.conv_up1(up(feat)), 0.2)
            feat = l(self.conv_up2(up(feat)), 0.2)
            return self.conv_last(l(self.conv_hr(feat), 0.2))

    torch.manual_seed(0)
    tnet = TNet().eval()
    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = R.import_rrdb_torch_state(state)

    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    ours = R.RRDBNet(num_blocks=B, features=F_, growth=G).apply(
        {"params": params}, x)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
        atol=5e-5, rtol=1e-3,
    )
