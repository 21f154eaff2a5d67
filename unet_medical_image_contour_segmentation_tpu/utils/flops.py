"""Analytic logical-FLOP counts for the UNet family.

"Logical" = the FLOPs of the math the model defines (2 * H * W * k * k * cin
* cout per conv), independent of how a layout executes it on the device.  The
s2d block-conv formulation (ops/s2d.py) physically performs up to 16x more
MACs at the small-channel levels, so device utilization ("physical" TF/s) can
exceed the logical TF/s reported from these numbers by a large factor.
Reporting both (bench.py) keeps the throughput headline honest: the number
that bounds further optimization is logical MFU.

Backward pass is counted with the standard 2x-forward convention (one dgrad +
one wgrad pass per conv), so a train step is ~3x the forward FLOPs.
"""

from __future__ import annotations

__all__ = ["unet_forward_flops", "hlo_forward_flops", "V5E_BF16_PEAK_FLOPS"]

# One v5e chip: 197 TF/s bf16 (public spec).
V5E_BF16_PEAK_FLOPS = 197e12


def _conv(h, w, k, cin, cout):
    return 2 * h * w * k * k * cin * cout


def hlo_forward_flops(model, h: int, w: int):
    """Logical forward FLOPs for any model via XLA's HLO cost analysis.

    Lowers the dense-NHWC eval forward at batch 1 (no compile) and reads the
    HLO-level FLOP estimate, which counts convolutions at their logical cost
    (2*HW*k²*cin*cout) independent of the execution layout — the wide/s2d
    layouts would report their inflated physical MACs, so the model is forced
    to ``layout='nhwc'`` first.  Returns None if cost analysis is unavailable.
    Covers UNet++ and YOLOv8-seg, whose nested/CSP topologies have no
    closed-form in ``unet_forward_flops``.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    if getattr(model, "layout", "nhwc") != "nhwc":
        model = dataclasses.replace(model, layout="nhwc")

    try:
        # Pin to the CPU backend: in a TPU process, init/lower on the remote
        # 'axon' backend is minutes-slow, and its cost analysis is
        # unavailable; CPU lowering is seconds and HLO flops are identical.
        with jax.default_device(jax.devices("cpu")[0]):
            params, state = model.init(jax.random.PRNGKey(0))
            x = jnp.zeros((1, h, w), jnp.float32) if model.n_channels == 1 \
                else jnp.zeros((1, h, w, model.n_channels), jnp.float32)

            def fwd(p, t):
                out = model.apply(p, state, t, train=False)
                return out[0] if isinstance(out, tuple) else out

            analysis = jax.jit(fwd).lower(params, x).cost_analysis()
    except Exception:
        return None
    if not analysis or "flops" not in analysis:
        return None
    return int(analysis["flops"])


def unet_forward_flops(model, h: int, w: int) -> int:
    """Logical forward FLOPs for one slice of shape (h, w) through a UNet.

    Mirrors the channel plan of ``UNet.init`` (models/unet.py): widths
    ``W0..W4``, ``factor=2`` halving the bottleneck/decoder widths when
    bilinear, ConvTranspose(k2, s2) upsampling otherwise, optional k7
    spatial-attention conv on every skip.  Elementwise work (BN, ReLU,
    pooling, bilinear upsample taps) is omitted — it is <1% of the conv
    FLOPs at these shapes.
    """
    W = model.widths
    f = 2 if model.bilinear else 1
    total = 0

    # inc at full resolution: cin -> W0 -> W0
    total += _conv(h, w, 3, model.n_channels, W[0]) + _conv(h, w, 3, W[0], W[0])

    # encoder: down_i runs at h/2^i
    down_io = [(W[0], W[1]), (W[1], W[2]), (W[2], W[3]), (W[3], W[4] // f)]
    for i, (cin, cout) in enumerate(down_io, 1):
        hh, ww = h >> i, w >> i
        total += _conv(hh, ww, 3, cin, cout) + _conv(hh, ww, 3, cout, cout)

    # decoder: up_i produces resolution h/2^(4-i)
    up_io = [
        (W[4], W[3] // f),
        (W[3], W[2] // f),
        (W[2], W[1] // f),
        (W[1], W[0]),
    ]
    for i, (cin, cout) in enumerate(up_io, 1):
        hh, ww = h >> (4 - i), w >> (4 - i)
        if model.bilinear:
            # upsample is tap arithmetic (omitted); DoubleConv(cin, cout, mid=cin//2)
            mid = cin // 2
        else:
            # ConvTranspose2d(k=2, s=2): every output pixel touches exactly one
            # kernel tap -> 2 * Hout * Wout * cin * cout/... == 2*hh*ww*cin*(cin//2)
            total += 2 * hh * ww * cin * (cin // 2)
            mid = cout
        if model.use_attention:
            total += _conv(hh, ww, 7, 2, 1)
        total += _conv(hh, ww, 3, cin, mid) + _conv(hh, ww, 3, mid, cout)

    # 1x1 head at full resolution
    total += _conv(h, w, 1, W[0], model.n_classes)
    return total
