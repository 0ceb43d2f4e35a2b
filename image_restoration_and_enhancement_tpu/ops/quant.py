"""Int8 (w8a8) serving path: drop-in quantized conv / dot primitives.

The 512px serving loop is FLOP-bound: its convs run at ~98% of the bf16
MXU peak and the whole-program bf16 FLOP floor is ~4.8 img/s/chip
(docs/STATUS.md), so the only lever past ~6x the A100 baseline is the int8
MXU rate. Measured on this v5e via scripts/probe_int8.py: s8xs8 matmul
244 TOPS (1.66x bf16), s8xs8 conv ~1.3x at SD shapes.

Design (TPU/XLA):
- Quantization lives INSIDE the jitted graph as custom `dot_general` /
  `conv_general_dilated` callables injected into flax nn.Dense / nn.Conv —
  the param tree (bf16 kernels) is completely unchanged, so checkpoints,
  importers and the training path are untouched.
- Weights: symmetric per-output-channel int8 (absmax / 127). The
  quantize-weights subgraph depends only on loop-invariant params, so XLA
  hoists it out of the sampling `lax.scan` (verified in HLO: the while
  body reads the pre-quantized s8 constants).
- Activations: dynamic symmetric per-tensor int8 — one absmax reduce per
  layer input, fused by XLA into the preceding elementwise chain.
- Accumulation in int32 on the MXU, rescale by (act_scale * w_scale[oc])
  in fp32, cast back to the layer dtype. Bias/norms stay fp32/bf16.

Mode is read at TRACE time (like every IRET_* knob): IRET_QUANT=int8, or
programmatically via `quant_mode("int8")` around function construction.

Static-scale mode ("int8_static"): profiling the dynamic path showed the
per-layer absmax reduce is the int8 path's main overhead — each reduce is
a 6ms/step fusion block of its own AND, when fused as a conv epilogue,
caps that conv fusion well below the s8 MXU rate (measured on v5e:
960->320ch 64px conv 4.4ms plain / 6.7ms with absmax epilogue / 5.4ms
with a static-scale quantize epilogue; the quantize epilogue is free-to-
NEGATIVE cost elsewhere since the s8 output halves write traffic). With
calibrated per-site scales the reduce disappears and the round/clip/
convert fuses into the producer. Calibration = run any traced function
under `calib_sink()`; every quantized site reports its activation absmax
(keyed by its flax module path, see models/layers.py QConv/QDense), take
the max over calibration inputs, `load_static_table({site: absmax})`,
then trace serving functions under mode "int8_static". Sites missing
from the table fall back to dynamic quantization.

The reference has no quantized path (fp16 torch end to end); this is a
beyond-reference serving feature, quality-gated by scripts/eval harness —
see tests/test_quant.py for the numeric gates.
"""
from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_MODE_OVERRIDE: Optional[str] = None


def current_mode() -> Optional[str]:
    if _MODE_OVERRIDE is not None:
        return _MODE_OVERRIDE or None
    m = os.environ.get("IRET_QUANT", "")
    return m or None


def set_mode(mode: Optional[str]):
    """Set the quantization mode persistently (vs the scoped quant_mode
    context manager). Applies to functions traced afterwards; pass None to
    fall back to the IRET_QUANT env var, "" to force off."""
    global _MODE_OVERRIDE
    _MODE_OVERRIDE = mode


@contextlib.contextmanager
def quant_mode(mode: Optional[str]):
    """Set the quantization mode for functions TRACED inside the context.
    (Already-jitted functions keep the mode they were traced with.)"""
    global _MODE_OVERRIDE
    prev = _MODE_OVERRIDE
    _MODE_OVERRIDE = mode or ""
    try:
        yield
    finally:
        _MODE_OVERRIDE = prev


_EPS = 1e-8

# --- site identity + calibration + static scales ---------------------------
# The current quantized call site (a flax module path string), set by the
# QConv/QDense wrappers in models/layers.py around the underlying call.
_SITE: Optional[str] = None
# When calibrating: list of (site, traced_absmax_f32_scalar) appended at
# trace time. The caller packages these into function outputs (legal as
# long as the sink is drained within the same trace scope, e.g. inside a
# lax.scan body for in-loop sites).
_CALIB_SINK: Optional[list] = None
# site -> float absmax from a calibration run (host floats: they enter the
# graph as constants, so no reduce / no extra fusion outputs).
_STATIC_TABLE: dict = {}
_STATIC_MISSES: set = set()


@contextlib.contextmanager
def at_site(name: str):
    global _SITE
    prev = _SITE
    _SITE = name
    try:
        yield
    finally:
        _SITE = prev


@contextlib.contextmanager
def calib_sink():
    """Collect (site, absmax) pairs for every quantized call traced inside.
    Yields the list; entries' absmax are traced f32 scalars that MUST be
    consumed within the same trace scope (returned from the traced fn)."""
    global _CALIB_SINK
    prev = _CALIB_SINK
    _CALIB_SINK = sink = []
    try:
        yield sink
    finally:
        _CALIB_SINK = prev


def load_static_table(table: dict):
    """Install {site: absmax_float} for mode "int8_static". Replaces any
    previously loaded table. Scales apply to functions traced afterwards."""
    global _STATIC_TABLE
    _STATIC_TABLE = {str(k): float(v) for k, v in table.items()}
    _STATIC_MISSES.clear()


def static_misses() -> set:
    """Sites that fell back to dynamic quantization since the last
    load_static_table (useful to detect calibration/serving drift)."""
    return set(_STATIC_MISSES)


def _static_scale() -> Optional[float]:
    if _SITE is None:
        return None
    a = _STATIC_TABLE.get(_SITE)
    if a is None:
        _STATIC_MISSES.add(_SITE)
        return None
    margin = float(os.environ.get("IRET_QUANT_STATIC_MARGIN", "1.0"))
    return max(a * margin / 127.0, _EPS)


def _quantize_per_tensor(x: jnp.ndarray):
    """Dynamic symmetric per-tensor int8. Returns (x_q, scale_f32)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    s = jnp.maximum(s, _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _quantize_activation(x: jnp.ndarray):
    """Per-tensor s8 activation quantize: static scale when the mode is
    "int8_static" and the current site is calibrated (pure elementwise —
    fuses into the producer), dynamic absmax otherwise. Under an active
    calib_sink the dynamic absmax is also reported as (site, scalar)."""
    if current_mode() == "int8_static":
        s = _static_scale()
        if s is not None:
            q = jnp.clip(
                jnp.round(x.astype(jnp.float32) * (1.0 / s)), -127, 127
            ).astype(jnp.int8)
            return q, s  # python float: folds into the rescale constant
    a = jnp.max(jnp.abs(x.astype(jnp.float32)))
    if _CALIB_SINK is not None and _SITE is not None:
        _CALIB_SINK.append((_SITE, a))
    s = jnp.maximum(a / 127.0, _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _quantize_weight_out_channel(w: jnp.ndarray):
    """Symmetric per-output-channel int8; out channel = last axis.
    Returns (w_q, scale_f32[out])."""
    reduce_axes = tuple(range(w.ndim - 1))
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes) / 127.0
    s = jnp.maximum(s, _EPS)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def conv_general_dilated(
    lhs,
    rhs,
    window_strides,
    padding,
    lhs_dilation=None,
    rhs_dilation=None,
    dimension_numbers=None,
    feature_group_count=1,
    precision=None,
    **kwargs,
):
    """Drop-in for lax.conv_general_dilated; int8 path when enabled.

    Falls through to the bf16/fp32 lax conv when quantization is off or the
    call shape isn't the standard NHWC/HWIO dense conv."""
    plain = lambda: lax.conv_general_dilated(
        lhs, rhs, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count, precision=precision,
        **kwargs,
    )
    if current_mode() not in ("int8", "int8_static"):
        return plain()
    if feature_group_count != 1 or not jnp.issubdtype(lhs.dtype, jnp.floating):
        return plain()
    if lhs_dilation is not None and any(d != 1 for d in lhs_dilation):
        return plain()
    if rhs_dilation is not None and any(d != 1 for d in rhs_dilation):
        return plain()

    xq, sx = _quantize_activation(lhs)
    wq, sw = _quantize_weight_out_channel(rhs)  # HWIO -> scale [O]

    # Zero-pad non-128-multiple input channel counts up to the lane tile
    # (DEFAULT ON; IRET_PAD_CONV_CIN=0 to disable — trace-time). The only
    # serving shape this hits is the 960-ch up-block concat conv (960 =
    # 7.5 lane tiles), whose s8 emitter runs at 150 TOPS vs ~380 for its
    # 128-multiple peers (trace r2). Zero channels contribute zero to the
    # integer accumulation, so the result is exact (bitwise-tested); the
    # pad fuses into the quantize pass. Measured end-to-end on v5e:
    # 4.051 vs 3.994 img/s (+1.4%, r2 session 6 A/B).
    if os.environ.get("IRET_PAD_CONV_CIN", "1") != "0" and lhs.ndim == 4:
        ci = xq.shape[-1]
        pad = (-ci) % 128
        if pad and ci >= 896:
            xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (0, pad)))
            wq = jnp.pad(wq, ((0, 0), (0, 0), (0, pad), (0, 0)))

    # IRET_CONV_KERNEL=1: route 3x3/stride-1/SAME convs through the
    # implicit-GEMM Pallas kernel (ops/conv_int8.py) — nine accumulated MXU
    # matmuls at the s8 matmul rate instead of XLA's slower s8 conv lowering.
    # IRET_CONV_KERNEL_HW (optional, e.g. "64,32"): only route convs whose
    # spatial height is in the list — lets a per-shape kernel win ship
    # without regressing the levels where XLA's emitter is faster (same
    # measured-window pattern as the attention dispatch, ops/attention.py).
    pad_tuple = tuple(map(tuple, padding)) if not isinstance(padding, str) else padding
    hw_gate = os.environ.get("IRET_CONV_KERNEL_HW", "")
    hw_ok = (not hw_gate) or (
        lhs.ndim == 4 and str(lhs.shape[1]) in hw_gate.split(",")
    )
    if (
        os.environ.get("IRET_CONV_KERNEL") == "1"
        and hw_ok
        and rhs.shape[:2] == (3, 3)
        and tuple(window_strides) == (1, 1)
        and pad_tuple in (((1, 1), (1, 1)), "SAME")
        and lhs.ndim == 4
    ):
        from . import conv_int8

        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return conv_int8.conv3x3_same_int8(
            xp, wq, sx * sw, out_dtype=lhs.dtype
        )

    # IRET_PROJ1X1_AS_DOT=1 (trace-time): run 1x1 convs (Transformer2D
    # spatial proj_in/proj_out, conv_shortcut, VAE quant convs) as a plain
    # channel contraction. The s8 conv emitter picks a {2,0,1} output
    # layout for these that forces standalone relayout copies around the
    # attention stack (trace r2: ~10ms/call); the dot form stays in the
    # token-major layout the transformer blocks already use.
    if (
        os.environ.get("IRET_PROJ1X1_AS_DOT") == "1"
        and rhs.shape[:2] == (1, 1)
        and tuple(window_strides) == (1, 1)
        and lhs.ndim == 4
    ):
        b, hh, ww, ci = xq.shape
        acc = lax.dot_general(
            xq.reshape(b, hh * ww, ci), wq[0, 0],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(b, hh, ww, -1)
    else:
        acc = lax.conv_general_dilated(
            xq, wq, window_strides, padding,
            dimension_numbers=dimension_numbers,
            feature_group_count=1,
            preferred_element_type=jnp.int32,
        )
    y = acc.astype(jnp.float32) * (sx * sw)  # broadcast over trailing O
    return y.astype(lhs.dtype)


def dot_general(lhs, rhs, dimension_numbers, precision=None,
                preferred_element_type=None):
    """Drop-in for lax.dot_general covering flax Dense's contraction
    (((lhs.ndim-1,), (0,)), ((), ())); anything else falls through."""
    plain = lambda: lax.dot_general(
        lhs, rhs, dimension_numbers, precision=precision,
        preferred_element_type=preferred_element_type,
    )
    if current_mode() not in ("int8", "int8_static"):
        return plain()
    expected = (((lhs.ndim - 1,), (0,)), ((), ()))
    if dimension_numbers != expected:
        return plain()
    if not jnp.issubdtype(lhs.dtype, jnp.floating) or rhs.ndim != 2:
        return plain()

    xq, sx = _quantize_activation(lhs)
    wq, sw = _quantize_weight_out_channel(rhs)  # [I, O] -> scale [O]
    acc = lax.dot_general(
        xq, wq, dimension_numbers, preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (sx * sw)
    return y.astype(lhs.dtype)
