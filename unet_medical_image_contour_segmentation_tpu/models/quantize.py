"""Post-training int8 quantization of the wide-layout eval forward.

An opt-in serving mode (``Predictor(quantize=True)`` / ``predict.py --int8``)
with no counterpart in the reference (it serves f32 torch); the win is
TPU-physical: v5e has 2x int8 MXU peak and the predict path is HBM-bound, so
halving the activation bytes measured 1.36x at the dominant level-0 conv
shape with the full requant epilogue included (benchmarks/probe_int8.py).

Scheme (standard PTQ, arranged for the wide layout's split/concat decoders):

* **Weights**: symmetric per-output-channel int8, quantized from the
  BN-folded kernels (models/fold_bn.py) with each input part's ACTIVATION
  scale folded into the kernel's cin slice first (``w_eff = w * s_in[cin]``).
  Folding input scales into the weights means mixed-scale inputs — the
  decoder's (skip, upsample) pairs — need no per-part rescale: the int32
  partial convs of ``conv_wide_split_int8`` share one dequant scale and sum
  exactly in integers.
* **Activations**: symmetric per-tensor scales from a one-shot calibration
  forward (amax observers on every quantized-conv input/output).  Scales are
  per-tensor scalars, so one calibration serves every input size.
* **Placement**: every 3x3 DoubleConv conv runs int8 (the FLOP/byte
  hotspots).  Upsample / ConvTranspose / SpatialAttention / the 1x1 head
  stay in the float compute dtype: they are cheap, and bilinear
  interpolation has no exact int8 form.  Encoder outputs requantize to int8
  (maxpool and the skip feeds are scale-preserving); decoder DoubleConv
  outputs dequantize straight to float (their only consumers are the float
  ops), skipping a requant round trip.

Eval-only.  Three topology walkers share the machinery: the UNet family
(mirroring ``models/wide_exec.py:apply_wide``'s folded branch), UNet++
(mirroring ``models/unet_nested.py:_apply_wide``, where each nested node's
j-way kernel-split conv sums int32 partials with per-part scales folded
into the kernel), and YOLOv8Seg (mirroring
``models/yolov8_seg.py:_apply_wide`` — SiLU epilogues at true scale,
residual requant-adds, stride-2 int8 downsamples, 1x1 int8 C2f/SPPF convs;
see ``_forward_yolo``).  Drift-guard tests pin int8-dequantized logits to
the float forward — tests/test_quantize.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import wide as W
from .wide_exec import MAX_BW, _attention, _widths_from_params

__all__ = ["calibrate_amax", "build_qparams", "build_qparams_pp",
           "build_qparams_yolo", "fold_for_quantize", "quantize_unet",
           "apply_wide_int8"]


def _amax(t) -> jnp.ndarray:
    return jnp.max(jnp.abs(t.astype(jnp.float32)))


def _quant_sym(x, s):
    """f32 -> int8 on the symmetric grid with scale ``s`` (a scalar array)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)


def _qconv(parts, channels, entry, bw, *, requant):
    """int8 conv + fused epilogue.

    ``parts``: one int8 tensor, or a list for a kernel-split input.
    Epilogue: int32 -> f32 * mul + badd, ReLU, then either int8 requant
    (``mul``/``badd`` were pre-divided by the output scale at build time) or
    a float dequant (mul = s_w, badd = bias).
    """
    if channels is None:
        y = W.conv_wide_int8(parts, entry["w"], bw)
    else:
        y = W.conv_wide_split_int8(parts, channels, entry["w"], bw)
    yf = y.astype(jnp.float32) * jnp.tile(entry["mul"], bw) \
        + jnp.tile(entry["badd"], bw)
    yf = jnp.maximum(yf, 0.0)
    if requant:
        return jnp.clip(jnp.round(yf), 0, 127).astype(jnp.int8)
    return yf


def _make_dc(quant: bool, cd, amax: Dict[str, jnp.ndarray]):
    """DoubleConv runner shared by the topology walkers.

    ``dc(name, sub, xin, bw, channels=None, requant=...)``: xin is a tensor
    or a parts list; quant mode runs int8 convs from qparams entries, calib
    mode runs the folded float convs and fills ``amax`` taps.
    """

    def dc(name, sub, xin, bw, channels=None, *, requant):
        if quant:
            y = _qconv(xin, channels, sub["conv1"], bw, requant=True)
            return _qconv(y, None, sub["conv2"], bw, requant=requant)
        if channels is None:
            y = W.conv_wide(xin, sub["conv1"]["w"], bw, sub["conv1"]["b"],
                            compute_dtype=cd, h_fold=False)
        else:
            y = W.conv_wide_split(xin, channels, sub["conv1"]["w"], bw,
                                  sub["conv1"]["b"], compute_dtype=cd,
                                  h_fold=False)
        y = jax.nn.relu(y)
        amax[f"{name}.c1"] = _amax(y)
        y = jax.nn.relu(W.conv_wide(y, sub["conv2"]["w"], bw,
                                    sub["conv2"]["b"], compute_dtype=cd,
                                    h_fold=False))
        amax[f"{name}.c2"] = _amax(y)
        return y

    return dc


def _forward(model, p, x, *, quant: bool, class_major: bool,
             unpack_output: bool):
    """Shared topology walker: calibration (quant=False, p = folded params,
    fills amax taps) and int8 execution (quant=True, p = qparams — same tree
    shape as the folded params plus scale scalars).

    Mirrors models/wide_exec.py:apply_wide's folded-eval branch exactly —
    same level structure, same split/concat decisions — so the activation
    scales line up with the tensors the int8 path consumes.
    """
    if x.ndim == 3:
        x = x[..., None]
    w = _widths_from_params(p)
    cd = model.compute_dtype or jnp.float32
    bws = [W.wide_block(c, MAX_BW) for c in w]
    amax: Dict[str, jnp.ndarray] = {}
    dc = _make_dc(quant, cd, amax)

    # -- encoder ------------------------------------------------------------
    x0 = W.pack(x, bws[0])
    if quant:
        x0 = _quant_sym(x0, p["s_x"])
    else:
        amax["x"] = _amax(x0)
    # inc..down3 requantize (consumed by int8 convs via maxpool/skips, both
    # scale-preserving); down4 dequantizes (its only consumer is the float
    # up1 upsample/ConvTranspose)
    cur = dc("inc", p["inc"], x0, bws[0], requant=True)
    feats = [(cur, bws[0], w[0])]
    cur_bw = bws[0]
    for i in range(1, 5):
        cur = W.max_pool2_wide(cur, cur_bw)
        cur_bw = max(cur_bw // 2, 1)
        if cur_bw != bws[i]:
            cur = W.reblock(cur, cur_bw, bws[i])
            cur_bw = bws[i]
        cur = dc(f"down{i}", p[f"down{i}"], cur, cur_bw, requant=(i < 4))
        if i < 4:
            feats.append((cur, cur_bw, w[i]))

    # -- decoder ------------------------------------------------------------
    y, y_bw = cur, cur_bw  # float in quant mode: down4 dequantized
    for i in range(1, 5):
        skip, skip_bw, skip_c = feats[4 - i]
        up = p[f"up{i}"]
        in_c = y.shape[-1] // y_bw
        if "upconv" in up:  # ConvTranspose2d(k2, s2), float
            y = W.conv_transpose2_wide(y.astype(cd), up["upconv"]["w"], y_bw,
                                       up["upconv"].get("b"), compute_dtype=cd)
            up_c = in_c // 2
        else:  # bilinear align_corners x2, float
            y = W.upsample2_ac_wide(y.astype(cd), y_bw)
            up_c = in_c
        y_bw = 2 * y_bw
        if y_bw != skip_bw:
            y = W.reblock(y, y_bw, skip_bw)
            y_bw = skip_bw
        if quant:
            y = _quant_sym(y, up["s_up"])
        else:
            amax[f"up{i}.up"] = _amax(y)
        if "att" in up:
            # SpatialAttention in float on the dequantized skip; its output
            # is the skip times a sigmoid in (0,1), so |out| <= |skip| and
            # the skip's OWN scale requantizes it, calibration-free
            if quant:
                skip_f = skip.astype(jnp.float32) * up["s_skip"]
                att = _attention(up["att"], skip_f.astype(cd), skip_bw,
                                 skip_c, cd=cd, h_fold=False)
                att = _quant_sym(att, up["s_skip"])
            else:
                att = _attention(up["att"], skip, skip_bw, skip_c, cd=cd,
                                 h_fold=False)
            cat = W.concat_wide([att, y.astype(att.dtype)], y_bw,
                                [skip_c, up_c])
            y = dc(f"up{i}", up["conv"], cat, y_bw, requant=False)
        else:
            y = dc(f"up{i}", up["conv"], [skip, y.astype(skip.dtype)], y_bw,
                   channels=[skip_c, up_c], requant=False)

    # -- head (1x1 conv, float) ----------------------------------------------
    head = W.conv1x1_wide_class_major if class_major else W.conv1x1_wide
    logits = head(y.astype(cd), p["outc"]["w"], y_bw, p["outc"].get("b"),
                  compute_dtype=cd)
    logits = logits.astype(jnp.float32)
    if unpack_output:
        logits = W.unpack(logits, y_bw)
    return logits, amax, y_bw


def _pp_requant(d: int, i: int, j: int) -> bool:
    """Does UNet++ node X[i][j] have later int8-conv consumers?

    Same-depth skips X[i][j'] (j' > j) exist iff j < d-1-i; they (and the
    scale-preserving maxpool to X[i+1][0]) consume int8.  The remaining
    consumers — the up path to X[i-1][j+1] and the 1x1 heads — are float
    and dequantize via the stored node scale.
    """
    return j < d - 1 - i


def _forward_pp(model, p, x, *, quant: bool, class_major: bool,
                unpack_output: bool):
    """UNet++ topology walker (mirrors models/unet_nested.py:_apply_wide).

    Quantization scheme as the UNet walker: every DoubleConv runs int8 with
    per-part input scales folded into the kernel cin slices (the nested
    nodes' j-way kernel-split convs then sum int32 partials exactly); the
    up path (ConvTranspose / bilinear) runs float on the dequantized source
    node and its output quantizes with its own calibrated scale.
    """
    if x.ndim == 3:
        x = x[..., None]
    d = model.depth
    cd = model.compute_dtype or jnp.float32
    w = [int(p[f"x{i}_0"]["conv2"]["w"].shape[-1]) for i in range(d)]
    bws = [W.wide_block(c, MAX_BW) for c in w]
    amax: Dict[str, jnp.ndarray] = {}
    dc = _make_dc(quant, cd, amax)

    x0 = W.pack(x, bws[0])
    if quant:
        x0 = _quant_sym(x0, p["s_x"])
    else:
        amax["x"] = _amax(x0)

    nodes = {}
    cur = x0
    for i in range(d):
        if i > 0:
            cur = W.max_pool2_wide(nodes[(i - 1, 0)], bws[i - 1])
            cur_bw = max(bws[i - 1] // 2, 1)
            if cur_bw != bws[i]:
                cur = W.reblock(cur, cur_bw, bws[i])
        nodes[(i, 0)] = dc(f"x{i}_0", p[f"x{i}_0"], cur, bws[i],
                           requant=_pp_requant(d, i, 0))

    for j in range(1, d):
        for i in range(d - j):
            b = bws[i]
            # skips X[i][0..j-1] all requant (k <= j-1 < d-1-i): int8 parts
            skips = [nodes[(i, k)] for k in range(j)]
            src = nodes[(i + 1, j - 1)]
            if quant and _pp_requant(d, i + 1, j - 1):
                src = src.astype(jnp.float32) * p["s_nodes"][f"x{i + 1}_{j - 1}"]
            src = src.astype(cd)
            up_name = f"up{i}_{j}"
            if model.bilinear:
                upped = W.upsample2_ac_wide(src, bws[i + 1])
                up_c = w[i + 1]
            else:
                p_up = p[up_name]
                upped = W.conv_transpose2_wide(src, p_up["w"], bws[i + 1],
                                               p_up.get("b"), compute_dtype=cd)
                up_c = w[i]
            up_bw = 2 * bws[i + 1]
            if up_bw != b:
                upped = W.reblock(upped, up_bw, b)
            if quant:
                upped = _quant_sym(upped, p["s_ups"][up_name])
            else:
                amax[f"{up_name}.up"] = _amax(upped)
                upped = upped.astype(skips[0].dtype)
            nodes[(i, j)] = dc(f"x{i}_{j}", p[f"x{i}_{j}"], skips + [upped], b,
                               channels=[w[i]] * j + [up_c],
                               requant=_pp_requant(d, i, j))

    b0 = bws[0]
    head = W.conv1x1_wide_class_major if class_major else W.conv1x1_wide
    if model.deep_supervision:
        outs = []
        for j in range(1, d):
            t = nodes[(0, j)]
            if quant and _pp_requant(d, 0, j):
                t = t.astype(jnp.float32) * p["s_nodes"][f"x0_{j}"]
            hp = p[f"out{j}"]
            outs.append(head(t.astype(cd), hp["w"], b0, hp.get("b"),
                             compute_dtype=cd))
        logits = sum(outs) / len(outs)
    else:
        logits = head(nodes[(0, d - 1)].astype(cd), p["outc"]["w"], b0,
                      p["outc"].get("b"), compute_dtype=cd)
    logits = logits.astype(jnp.float32)
    if unpack_output:
        logits = W.unpack(logits, b0)
    return logits, amax, b0


# -- YOLOv8Seg walker ---------------------------------------------------------

def _requant_signed(yf, inv_s):
    """f32 -> int8 on the signed symmetric grid (SiLU outputs go negative,
    unlike the ReLU epilogues above that clip to [0, 127])."""
    return jnp.clip(jnp.round(yf * inv_s), -127, 127).astype(jnp.int8)


def _maxpool5_same_int8(x):
    """SPPF's 5x5 stride-1 SAME max pool on int8 (scale-preserving)."""
    from jax import lax

    return lax.reduce_window(
        x, jnp.array(-128, jnp.int8), lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )


def _forward_yolo(model, p, x, *, quant: bool, class_major: bool,
                  unpack_output: bool):
    """YOLOv8Seg topology walker (mirrors models/yolov8_seg.py:_apply_wide).

    Differences from the UNet walkers driven by the architecture:

    * **SiLU epilogue**: SiLU does not commute with a positive scale (ReLU
      does), so the conv epilogue dequantizes at TRUE scale (mul = s_w,
      badd = b), applies x*sigmoid(x), then requantizes with a separate
      ``inv_s`` — and the int8 grid is signed (SiLU < 0 left of 0).
    * **Residual adds** (C2f bottlenecks): the sum of two differently-scaled
      int8 tensors dequantizes, adds in f32, and requantizes to the SUM's
      own calibrated scale — one fused elementwise op.
    * **Mixed-scale concats** (C2f parts, FPN neck, SPPF) need no rescale:
      per-part activation scales fold into the consumer kernel's cin slices
      at build time, exactly like the UNet decoders' split convs.
    * **Placement**: every CBS conv runs int8 — including the stride-2
      downsamples (conv_wide_int8 stride support) and the 1x1 C2f/SPPF
      convs (conv1x1_wide_int8).  The ConvTranspose ups, nearest upsamples
      (scale-preserving: stays int8), maxpools (ditto) and the 1x1 head
      follow the UNet placement rules.
    """
    from .yolov8_seg import _maxpool5_same

    if x.ndim == 3:
        x = x[..., None]
    cd = model.compute_dtype or jnp.float32
    d = model.depths
    amax: Dict[str, jnp.ndarray] = {}

    def silu_f(y):
        y32 = y.astype(jnp.float32)
        return (y32 * jax.nn.sigmoid(y32)).astype(y.dtype)

    def cbs(name, entry, t, bw, stride=1, channels=None, *, requant):
        """Folded CBS (conv + SiLU).  ``t``: a tensor or a parts list.

        Which path runs is decided by the ENTRY's format, not globally:
        an int8 entry ({"w": int8, "mul", "badd"[, "inv_s"]}) runs the
        quantized conv; a float entry ({"w", "b"}) runs the folded float
        conv — so the builder chooses the placement per conv (the "proto"
        scope keeps the backbone/neck float).  Calibration (quant=False)
        always runs float and records amax taps.
        """
        bwo = max(bw // stride, 1)
        if isinstance(t, (list, tuple)):
            t = (jnp.concatenate(t, axis=-1) if bw == 1
                 else W.concat_wide(t, bw, channels))
        if quant and "mul" in entry:
            if entry["w"].shape[0] == 1:
                y = W.conv1x1_wide_int8(t, entry["w"], bw)
            else:
                y = W.conv_wide_int8(t, entry["w"], bw, stride=stride)
            yf = (y.astype(jnp.float32) * jnp.tile(entry["mul"], bwo)
                  + jnp.tile(entry["badd"], bwo))
            yf = yf * jax.nn.sigmoid(yf)
            if requant:
                return _requant_signed(yf, entry["inv_s"]), bwo
            # cast dequantized outputs to the compute dtype HERE so the
            # materialized tensor is 2-byte even if the consumer's cast
            # doesn't fuse back into this epilogue (p_c3's output is a
            # full-resolution plane)
            return yf.astype(cd), bwo
        w_ = entry["w"]
        if w_.shape[0] == 1 and stride == 1 and bw > 1:
            y = W.conv1x1_wide(t, w_, bw, entry["b"], compute_dtype=cd)
        else:
            y = W.conv_wide(t, w_, bw, entry["b"], compute_dtype=cd,
                            stride=stride, h_fold=False)
        y = silu_f(y)
        if not quant:
            amax[name] = _amax(y)
        return y, bwo

    def bottleneck(base, k, entry, t, bw):
        y, _ = cbs(f"{base}.m{k}.cv1", entry["cv1"], t, bw, requant=True)
        yf, _ = cbs(f"{base}.m{k}.cv2", entry["cv2"], y, bw, requant=False)
        if quant and "res_s" in entry:
            sf = t.astype(jnp.float32) * entry["res_s"] + yf.astype(jnp.float32)
            return _requant_signed(sf, entry["add_inv_s"])
        out = t + yf.astype(t.dtype)
        if not quant:
            amax[f"{base}.m{k}.add"] = _amax(out)
        return out

    def c2f(base, entry, t, bw, n, channels=None, *, requant_out=True):
        y, _ = cbs(f"{base}.cv1", entry["cv1"], t, bw, channels=channels,
                   requant=True)
        c = (y.shape[-1] // bw) // 2
        parts = W.split_wide(y, bw, [c, c])
        bw_b = W.wide_block(c)
        chain = W.reblock(parts[1], bw, bw_b)
        for k in range(n):
            chain = bottleneck(base, k, entry[f"m{k}"], chain, bw_b)
            parts.append(W.reblock(chain, bw_b, bw))
        out, _ = cbs(f"{base}.cv2", entry["cv2"], parts, bw,
                     channels=[c] * (2 + n), requant=requant_out)
        return out

    # -- backbone -------------------------------------------------------------
    x0 = W.pack(x, 8)
    if quant and "s_x" in p:
        x0 = _quant_sym(x0, p["s_x"])
    elif not quant:
        amax["x"] = _amax(x0)
    cur, bw = cbs("stem", p["stem"], x0, 8, stride=2, requant=True)
    feats = {}
    for i in range(4):
        cur, bw = cbs(f"d{i}", p[f"down{i}"], cur, bw, stride=2, requant=True)
        c_i = cur.shape[-1] // bw
        bw_opt = W.wide_block(c_i)
        if bw != bw_opt:
            cur = W.reblock(cur, bw, bw_opt)
            bw = bw_opt
        cur = c2f(f"c2f{i}", p[f"c2f{i}"], cur, bw, d[i])
        feats[i] = W.unpack(cur, bw)
    if bw != 1:
        cur = W.unpack(cur, bw)
        bw = 1

    # -- SPPF (all bw == 1 from here to the proto head) -----------------------
    y, _ = cbs("sppf.cv1", p["sppf"]["cv1"], cur, 1, requant=True)
    mp = _maxpool5_same_int8 if y.dtype == jnp.int8 else _maxpool5_same
    p1 = mp(y)
    p2 = mp(p1)
    p3m = mp(p2)
    y, _ = cbs("sppf.cv2", p["sppf"]["cv2"], [y, p1, p2, p3m], 1, requant=True)

    # -- FPN neck (nearest x2 is a scale-preserving copy: stays int8) ---------
    def up2(t):
        return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)

    p4 = c2f("n4", p["n4"], [up2(y), feats[2]], 1, d[2])
    p3 = c2f("n3", p["n3"], [up2(p4), feats[1]], 1, d[1], requant_out=False)

    # -- proto head: ConvT float; each p_c conv re-enters int8 ----------------
    def proto_up(name, t, bw_in, c_out):
        t = W.conv_transpose2_wide(t.astype(cd), p[name]["w"], bw_in,
                                   p[name].get("b"), compute_dtype=cd)
        bw2 = 2 * bw_in
        bw_opt = W.wide_block(c_out)
        if bw2 != bw_opt:
            t = W.reblock(t, bw2, bw_opt)
            bw2 = bw_opt
        return t, bw2

    c = int(p["p_c1"]["w"].shape[-1]) * 2  # widths from params
    t, bw = proto_up("p_up1", p3, 1, c // 2)
    for k, c_out in ((1, c // 2), (2, c // 4), (3, c // 4)):
        if quant and f"s_pc{k}" in p:
            tq = _quant_sym(t, p[f"s_pc{k}"])
        else:
            if not quant:
                amax[f"p_c{k}.in"] = _amax(t)
            tq = t
        t, bw = cbs(f"p_c{k}", p[f"p_c{k}"], tq, bw, requant=False)
        if k < 3:
            t, bw = proto_up(f"p_up{k + 1}", t, bw, c // 4)

    head = W.conv1x1_wide_class_major if class_major else W.conv1x1_wide
    logits = head(t.astype(cd), p["head"]["w"], bw, p["head"].get("b"),
                  compute_dtype=cd)
    logits = logits.astype(jnp.float32)
    if unpack_output:
        logits = W.unpack(logits, bw)
    return logits, amax, bw


def _walker_for(tree):
    if "x0_0" in tree:
        return _forward_pp
    if "stem" in tree:
        return _forward_yolo
    return _forward


# -- calibration ---------------------------------------------------------------

def calibrate_amax(model, folded_params, images) -> Dict[str, float]:
    """Run the float eval forward with amax observers on one or more batches.

    ``images``: [B, H, W, C] (or rank-3 single-channel) float array with
    H, W % 16 == 0.  Returns {tap name: amax} as python floats; taps are
    per-tensor, so one calibration size serves every inference size.
    """

    walker = _walker_for(folded_params)

    @jax.jit
    def run(fp, x):
        _, amax, _ = walker(model, fp, x, quant=False, class_major=False,
                            unpack_output=False)
        return amax

    arr = jnp.asarray(images)
    out: Optional[Dict[str, float]] = None
    vals = {k: float(v) for k, v in jax.device_get(run(folded_params, arr)).items()}
    out = vals
    return out


# -- qparams builder --------------------------------------------------------------

def _quantize_kernel(w, b, s_in, s_out):
    """HWIO kernel + bias -> {w: int8, mul, badd} with input scales folded.

    ``s_in``: per-cin input-scale vector (f32, len cin) — constant for
    single-part inputs, a per-part concatenation for split/concat inputs.
    ``s_out``: output activation scale (requant) or None (float dequant).
    """
    w = np.asarray(w, np.float32)
    b = np.asarray(b, np.float32)
    w_eff = w * np.asarray(s_in, np.float32)[None, None, :, None]
    s_w = np.maximum(np.abs(w_eff).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    w_q = np.clip(np.round(w_eff / s_w), -127, 127).astype(np.int8)
    if s_out is None:
        mul, badd = s_w, b
    else:
        mul, badd = s_w / s_out, b / s_out
    return {"w": jnp.asarray(w_q), "mul": jnp.asarray(mul, jnp.float32),
            "badd": jnp.asarray(badd, jnp.float32)}


def build_qparams(model, folded_params, amax: Dict[str, float]):
    """Folded params + calibration amaxes -> the int8 parameter pytree.

    Same tree shape as the folded params (the walker is shared) with conv
    entries replaced by {w:int8, mul, badd} and scale scalars added; the
    requant-vs-dequant decisions are positional in the walker, not stored.
    """
    fp = folded_params
    s = {k: max(v, 1e-12) / 127.0 for k, v in amax.items()}

    def dc_entry(name, sub, s_in_vec, requant_out):
        c1 = _quantize_kernel(sub["conv1"]["w"], sub["conv1"]["b"],
                              s_in_vec, s[f"{name}.c1"])
        cin2 = sub["conv2"]["w"].shape[2]
        c2 = _quantize_kernel(
            sub["conv2"]["w"], sub["conv2"]["b"],
            np.full(cin2, s[f"{name}.c1"], np.float32),
            s[f"{name}.c2"] if requant_out else None)
        return {"conv1": c1, "conv2": c2}

    qp = {"s_x": jnp.float32(s["x"]), "outc": fp["outc"]}
    cin0 = fp["inc"]["conv1"]["w"].shape[2]
    qp["inc"] = dc_entry("inc", fp["inc"],
                         np.full(cin0, s["x"], np.float32), True)
    prev = "inc"
    for i in range(1, 5):
        cin = fp[f"down{i}"]["conv1"]["w"].shape[2]
        qp[f"down{i}"] = dc_entry(
            f"down{i}", fp[f"down{i}"],
            np.full(cin, s[f"{prev}.c2"], np.float32), i < 4)
        prev = f"down{i}"

    w = _widths_from_params(fp)
    skip_scale_names = ["down3.c2", "down2.c2", "down1.c2", "inc.c2"]
    for i in range(1, 5):
        p_up = fp[f"up{i}"]
        skip_c = w[4 - i]
        s_skip = s[skip_scale_names[i - 1]]
        s_up = s[f"up{i}.up"]
        cin = p_up["conv"]["conv1"]["w"].shape[2]
        s_in = np.concatenate([
            np.full(skip_c, s_skip, np.float32),
            np.full(cin - skip_c, s_up, np.float32),
        ])
        entry = {
            "conv": {
                "conv1": _quantize_kernel(p_up["conv"]["conv1"]["w"],
                                          p_up["conv"]["conv1"]["b"],
                                          s_in, s[f"up{i}.c1"]),
                "conv2": _quantize_kernel(
                    p_up["conv"]["conv2"]["w"], p_up["conv"]["conv2"]["b"],
                    np.full(p_up["conv"]["conv2"]["w"].shape[2],
                            s[f"up{i}.c1"], np.float32), None),
            },
            "s_up": jnp.float32(s_up),
        }
        if "upconv" in p_up:
            entry["upconv"] = p_up["upconv"]
        if "att" in p_up:
            entry["att"] = p_up["att"]
            entry["s_skip"] = jnp.float32(s_skip)
        qp[f"up{i}"] = entry
    return qp


def build_qparams_pp(model, folded_params, amax: Dict[str, float]):
    """UNet++ folded params + calibration amaxes -> the int8 pytree.

    Stored scales: ``s_nodes[name]`` dequantizes a requantized node for its
    float consumers (the up path, deep-supervision heads); ``s_ups[name]``
    quantizes an upsampled tensor for the nested convs.  Requant decisions
    are positional (``_pp_requant``), not stored.
    """
    fp = folded_params
    d = model.depth
    s = {k: max(v, 1e-12) / 127.0 for k, v in amax.items()}
    w = [int(fp[f"x{i}_0"]["conv2"]["w"].shape[-1]) for i in range(d)]

    def dc_entry(name, sub, s_in_vec, requant_out):
        c1 = _quantize_kernel(sub["conv1"]["w"], sub["conv1"]["b"],
                              s_in_vec, s[f"{name}.c1"])
        cin2 = sub["conv2"]["w"].shape[2]
        c2 = _quantize_kernel(
            sub["conv2"]["w"], sub["conv2"]["b"],
            np.full(cin2, s[f"{name}.c1"], np.float32),
            s[f"{name}.c2"] if requant_out else None)
        return {"conv1": c1, "conv2": c2}

    qp = {"s_x": jnp.float32(s["x"]), "s_nodes": {}, "s_ups": {}}
    if model.deep_supervision:
        for j in range(1, d):
            qp[f"out{j}"] = fp[f"out{j}"]
    else:
        qp["outc"] = fp["outc"]

    prev_scale = s["x"]
    for i in range(d):
        name = f"x{i}_0"
        cin = fp[name]["conv1"]["w"].shape[2]
        rq = _pp_requant(d, i, 0)
        qp[name] = dc_entry(name, fp[name],
                            np.full(cin, prev_scale, np.float32), rq)
        if rq:
            qp["s_nodes"][name] = jnp.float32(s[f"{name}.c2"])
        prev_scale = s[f"{name}.c2"]

    for j in range(1, d):
        for i in range(d - j):
            name = f"x{i}_{j}"
            up_name = f"up{i}_{j}"
            s_up = s[f"{up_name}.up"]
            up_c = w[i + 1] if model.bilinear else w[i]
            s_in = np.concatenate(
                [np.full(w[i], s[f"x{i}_{k}.c2"], np.float32)
                 for k in range(j)]
                + [np.full(up_c, s_up, np.float32)])
            rq = _pp_requant(d, i, j)
            qp[name] = dc_entry(name, fp[name], s_in, rq)
            if rq:
                qp["s_nodes"][name] = jnp.float32(s[f"{name}.c2"])
            qp["s_ups"][up_name] = jnp.float32(s_up)
            if not model.bilinear:
                qp[up_name] = fp[up_name]
    return qp


def build_qparams_yolo(model, folded_params, amax: Dict[str, float],
                       scope: str = "proto"):
    """YOLOv8Seg folded params + calibration amaxes -> the int8 pytree.

    Per-entry storage differs from the UNet builders because SiLU does not
    commute with scaling: ``mul``/``badd`` are the TRUE dequant (s_w, b) and
    requantization uses a separate ``inv_s``.  Residual entries carry
    ``res_s`` (the chain input's scale) and ``add_inv_s`` (the sum's).
    Mixed-scale concat inputs (C2f parts, FPN neck) fold per-part scales
    into the consumer kernel's cin slices, as the UNet decoders do.

    ``scope`` selects the placement (the walker follows the entry formats):

    * ``"proto"`` (default): only the proto-head CBS convs (p_c1..3, the
      FLOP-dominant full/half-resolution planes) run int8; backbone + neck
      stay folded float.  Measured best on v5e: the backbone/neck int8 wins
      are cancelled by int8 lane-shuffle costs (the wide-layout
      concat/reblock traffic doesn't shrink with the dtype) and an unfused
      SPPF reduce_window — benchmarks/probe_int8_yolo.py.
    * ``"full"``: everything quantizes (the UNet-style placement).
    """
    fp = folded_params
    d = model.depths
    s = {k: max(v, 1e-12) / 127.0 for k, v in amax.items()}

    def qcbs(entry, s_in_vec, s_out):
        w = np.asarray(entry["w"], np.float32)
        b = np.asarray(entry["b"], np.float32)
        w_eff = w * np.asarray(s_in_vec, np.float32)[None, None, :, None]
        s_w = np.maximum(np.abs(w_eff).max(axis=(0, 1, 2)) / 127.0, 1e-12)
        w_q = np.clip(np.round(w_eff / s_w), -127, 127).astype(np.int8)
        out = {"w": jnp.asarray(w_q), "mul": jnp.asarray(s_w, jnp.float32),
               "badd": jnp.asarray(b, jnp.float32)}
        if s_out is not None:
            out["inv_s"] = jnp.float32(1.0 / s_out)
        return out

    def const(entry, sv):
        return np.full(entry["w"].shape[2], sv, np.float32)

    def qc2f(base, entry, n, s_in_vec, requant_out):
        out = {"cv1": qcbs(entry["cv1"], s_in_vec, s[f"{base}.cv1"])}
        c = entry["cv1"]["w"].shape[3] // 2
        chain_s = s[f"{base}.cv1"]
        for k in range(n):
            m = entry[f"m{k}"]
            out[f"m{k}"] = {
                "cv1": qcbs(m["cv1"], const(m["cv1"], chain_s),
                            s[f"{base}.m{k}.cv1"]),
                "cv2": qcbs(m["cv2"], const(m["cv2"], s[f"{base}.m{k}.cv1"]),
                            None),
                "res_s": jnp.float32(chain_s),
                "add_inv_s": jnp.float32(1.0 / s[f"{base}.m{k}.add"]),
            }
            chain_s = s[f"{base}.m{k}.add"]
        parts_s = ([s[f"{base}.cv1"]] * 2
                   + [s[f"{base}.m{k}.add"] for k in range(n)])
        s_in2 = np.concatenate([np.full(c, ps, np.float32) for ps in parts_s])
        out["cv2"] = qcbs(entry["cv2"], s_in2,
                          s[f"{base}.cv2"] if requant_out else None)
        return out

    if scope == "full":
        qp = {"s_x": jnp.float32(s["x"])}
        qp["stem"] = qcbs(fp["stem"], const(fp["stem"], s["x"]), s["stem"])
        prev = "stem"
        for i in range(4):
            qp[f"down{i}"] = qcbs(fp[f"down{i}"],
                                  const(fp[f"down{i}"], s[prev]), s[f"d{i}"])
            qp[f"c2f{i}"] = qc2f(f"c2f{i}", fp[f"c2f{i}"], d[i],
                                 const(fp[f"c2f{i}"]["cv1"], s[f"d{i}"]), True)
            prev = f"c2f{i}.cv2"
        qp["sppf"] = {
            "cv1": qcbs(fp["sppf"]["cv1"],
                        const(fp["sppf"]["cv1"], s["c2f3.cv2"]),
                        s["sppf.cv1"]),
            "cv2": qcbs(fp["sppf"]["cv2"],
                        const(fp["sppf"]["cv2"], s["sppf.cv1"]),
                        s["sppf.cv2"]),
        }
        c5 = fp["sppf"]["cv2"]["w"].shape[3]
        c4 = fp["c2f2"]["cv2"]["w"].shape[3]
        c3 = fp["c2f1"]["cv2"]["w"].shape[3]
        qp["n4"] = qc2f("n4", fp["n4"], d[2], np.concatenate([
            np.full(c5, s["sppf.cv2"], np.float32),
            np.full(c4, s["c2f2.cv2"], np.float32)]), True)
        qp["n3"] = qc2f("n3", fp["n3"], d[1], np.concatenate([
            np.full(c4, s["n4.cv2"], np.float32),
            np.full(c3, s["c2f1.cv2"], np.float32)]), False)
    else:  # "proto": backbone + neck stay folded float
        assert scope == "proto", scope
        qp = {k: fp[k] for k in
              ["stem", "sppf", "n4", "n3"]
              + [f"down{i}" for i in range(4)]
              + [f"c2f{i}" for i in range(4)]}
    for k in (1, 2, 3):
        qp[f"p_up{k}"] = fp[f"p_up{k}"]
        qp[f"s_pc{k}"] = jnp.float32(s[f"p_c{k}.in"])
        qp[f"p_c{k}"] = qcbs(fp[f"p_c{k}"],
                             const(fp[f"p_c{k}"], s[f"p_c{k}.in"]), None)
    qp["head"] = fp["head"]
    return qp


def fold_for_quantize(model, params, bn_state):
    """BN-fold ``params`` for the int8 path, whatever the topology.

    UNet family / UNet++ fold via fold_params (DoubleConv subtrees — the
    same folded tree the float fused serving path uses); YOLOv8Seg folds
    its CBS blocks via fold_yolo_params (used ONLY by the quantize walkers;
    the float yolo eval keeps live BN).  Raises KeyError if nothing folds.
    """
    from .fold_bn import fold_params, fold_yolo_params

    try:
        return fold_params(params, bn_state)
    except (KeyError, TypeError):
        return fold_yolo_params(params, bn_state)


def quantize_unet(model, folded_params, calib_images):
    """Calibrate + build in one call -> qparams for ``apply_wide_int8``.

    Dispatches on the folded-param topology: UNet family (``inc``/``down*``),
    UNet++ (``x{i}_{j}`` nodes), or YOLOv8Seg (``stem``/``sppf``).
    """
    amax = calibrate_amax(model, folded_params, calib_images)
    if "x0_0" in folded_params:
        return build_qparams_pp(model, folded_params, amax)
    if "stem" in folded_params:
        return build_qparams_yolo(model, folded_params, amax)
    return build_qparams(model, folded_params, amax)


# -- execution --------------------------------------------------------------------

def apply_wide_int8(model, qparams, x, *, unpack_output: bool = True,
                    class_major: bool = False):
    """int8 eval forward.  Returns (logits_f32, ("wide", bw_out)).

    ``unpack_output=False`` + ``class_major=True`` mirrors
    ``UNet.apply_fused`` for the fused argmax predict path.
    """
    assert not (class_major and unpack_output), "class-major lanes cannot unpack"
    walker = _walker_for(qparams)
    logits, _, bw = walker(model, qparams, x, quant=True,
                           class_major=class_major,
                           unpack_output=unpack_output)
    return logits, ("wide", bw)
