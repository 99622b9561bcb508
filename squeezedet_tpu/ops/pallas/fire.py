"""Pallas TPU kernel: fused Fire module.

A Fire module (reference src/model/squeezedet.py:9-23) is
``squeeze 1x1 -> ReLU -> [expand 1x1 || expand 3x3] -> ReLU -> concat``.
Under XLA each conv is its own kernel, so the squeeze activation makes an
HBM round-trip (write once, read twice). This kernel keeps it in VMEM:

- the input is pre-padded by one pixel (XLA pad, fused upstream) so each
  row-tile can read its halo with a plain dynamic slice from HBM;
- squeeze runs on the (T+2, W+2) padded tile as one MXU matmul;
- boundary rows/cols of the squeeze activation are zeroed (3x3 expand pads
  in *activation* space — relu(b_sq) from padded input would be wrong);
- expand1x1 is one matmul on the center tile; expand3x3 is nine shifted
  matmuls accumulated in fp32;
- both outputs are written as one concatenated block.

Gradients: `fire_fused` carries a custom VJP whose backward pass is the
XLA autodiff of the reference lax implementation, so training can use the
fused forward without a hand-written backward kernel.

All matmuls set preferred_element_type=float32 (MXU accumulation).

STATUS — retired from the model (round 3). Standalone it beats XLA at
96x312 (4.4 vs 5.0 ms), but end-to-end it LOSES on both architectures
(squeezedetplus predict 25.8 vs 23.4 ms/batch-20, squeezedet 13.5 vs
10.1; train 89.4 vs 82.0 / 41.6 vs 37.6 ms — EVIDENCE.md): the
custom-call boundary blocks XLA's conv/pool fusion around the kernel.
Kept, parity-tested (tests/test_pallas_fire.py), as the repo's reference
Pallas kernel and the starting point if shapes ever change the verdict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int) -> int:
    """Largest row-tile <= 8 that divides H; small tiles keep the kernel's
    VMEM footprint (input slice + squeeze activation + accumulators +
    double-buffered output block) well under the 16MB budget."""
    for t in (8, 6, 4, 3, 2, 1):
        if h % t == 0:
            return t
    return 1


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _fire_kernel(
    x_hbm,  # (B, H+2, W2p, Cp) padded input, stays in HBM
    wsq_ref,  # (Cp, S)
    bsq_ref,  # (S,)
    we1_ref,  # (S, E1)
    be1_ref,  # (E1,)
    we3_ref,  # (3, 3, S, E3)
    be3_ref,  # (E3,)
    out_ref,  # (1, T, Wp, E1 + E3)
    x_vmem,  # scratch (T+2, W2p, Cp)
    copy_sem,
    *,
    tile: int,
    num_tiles: int,
    w: int,  # logical output width
    wp: int,  # padded output width (multiple of 8)
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    tp2, w2p = x_vmem.shape[0], x_vmem.shape[1]
    cp = x_vmem.shape[2]
    s_ch = wsq_ref.shape[1]
    e1_ch = we1_ref.shape[1]
    dtype = x_vmem.dtype

    # halo read: rows [t*tile, t*tile + tile + 2) of the padded input.
    # Mosaic allows arbitrary slicing in non-tiled dims (B, H); the tiled
    # dims (W, C) are full-extent and pre-padded to (8, 128) multiples.
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, tp2)], x_vmem, copy_sem
    )
    dma.start()
    dma.wait()

    # squeeze on the full padded tile: (T+2, W2p, Cp) x (Cp, S) without
    # flattening (reshapes across tiled dims cost Mosaic relayout copies);
    # padded channels of x are zero and the matching wsq rows are zero.
    s = lax.dot_general(
        x_vmem[:], wsq_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = jnp.maximum(s + bsq_ref[:].astype(jnp.float32), 0.0)
    s = s.astype(dtype)

    # zero the activation wherever it falls outside the image: the 3x3
    # expand pads with zeros in *activation* space, but squeeze of padded
    # input would give relu(b_sq) there. Valid image cols are [1, w].
    col_ids = lax.broadcasted_iota(jnp.int32, (tp2, w2p, 1), 1)
    ok = (col_ids > 0) & (col_ids < w + 1)
    row_ids = lax.broadcasted_iota(jnp.int32, (tp2, w2p, 1), 0)
    ok = ok & ((row_ids > 0) | (t > 0))
    ok = ok & ((row_ids < tp2 - 1) | (t < num_tiles - 1))
    s = jnp.where(ok, s, jnp.zeros_like(s))

    # expand 1x1 on the center tile (width wp; cols >= w are zero-masked)
    s_center = s[1 : tile + 1, 1 : wp + 1]
    e1 = lax.dot_general(
        s_center, we1_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e1 = jnp.maximum(e1 + be1_ref[:].astype(jnp.float32), 0.0)

    # expand 3x3 as nine shifted matmuls, fp32 accumulator
    acc = jnp.zeros((tile, wp, we3_ref.shape[-1]), jnp.float32)
    acc += be3_ref[:].astype(jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc += lax.dot_general(
                s[dy : dy + tile, dx : dx + wp], we3_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    e3 = jnp.maximum(acc, 0.0)

    out_ref[0] = jnp.concatenate(
        [e1.astype(out_ref.dtype), e3.astype(out_ref.dtype)], axis=-1
    )


def _fire_pallas_raw(x, wsq, bsq, we1, be1, we3, be3, *, interpret=False):
    b, h, w, c = x.shape
    s_ch = wsq.shape[-1]
    e1_ch = we1.shape[-1]
    e3_ch = we3.shape[-1]
    tile = _pick_tile(h)
    num_tiles = h // tile

    # Mosaic alignment: tiled dims (W, C) of HBM-sliced buffers must be
    # multiples of (8, 128); the row dim is sliced freely.
    cp = _round_up(c, 128)
    wp = _round_up(w, 8)
    # the shifted windows [dx, dx+wp) must stay inside the padded buffer,
    # and the buffer width itself must stay 8-aligned for HBM slicing
    w2p = _round_up(max(w + 2, wp + 2), 8)
    if not interpret:
        assert (e1_ch + e3_ch) % 128 == 0, "expand channels must tile to 128"

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w2p - w - 1), (0, cp - c)))

    wsq2 = jnp.pad(wsq.reshape(c, s_ch), ((0, cp - c), (0, 0)))
    we12 = we1.reshape(s_ch, e1_ch)

    kernel = functools.partial(
        _fire_kernel, tile=tile, num_tiles=num_tiles, w=w, wp=wp
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wp, e1_ch + e3_ch), x.dtype),
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded x, DMA'd per tile
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, wp, e1_ch + e3_ch),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 2, w2p, cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wsq2, bsq, we12, be1, we3, be3)
    return out[:, :, :w, :]


def _fire_lax(x, wsq, bsq, we1, be1, we3, be3):
    """Reference implementation (identical math, XLA convs)."""

    def conv(inp, kernel, pad):
        return lax.conv_general_dilated(
            inp,
            kernel,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=inp.dtype,
        )

    s = jax.nn.relu(conv(x, wsq, 0) + bsq)
    e1 = jax.nn.relu(conv(s, we1, 0) + be1)
    e3 = jax.nn.relu(conv(s, we3, 1) + be3)
    return jnp.concatenate([e1, e3], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fire_fused(x, wsq, bsq, we1, be1, we3, be3, interpret=False):
    """Fused Fire forward (Pallas); backward via XLA autodiff of the lax
    path. Weight layouts: wsq (1,1,C,S), we1 (1,1,S,E1), we3 (3,3,S,E3)."""
    return _fire_pallas_raw(x, wsq, bsq, we1, be1, we3, be3, interpret=interpret)


def _fire_fwd(x, wsq, bsq, we1, be1, we3, be3, interpret):
    out = _fire_pallas_raw(x, wsq, bsq, we1, be1, we3, be3, interpret=interpret)
    return out, (x, wsq, bsq, we1, be1, we3, be3)


def _fire_bwd(interpret, residuals, g):
    _, vjp = jax.vjp(_fire_lax, *residuals)
    return vjp(g)


fire_fused.defvjp(_fire_fwd, _fire_bwd)
