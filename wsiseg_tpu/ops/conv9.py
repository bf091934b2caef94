"""Pallas fused 3×3 conv: nine shifted VMEM matmuls + affine epilogue.

XLA's conv lowering collapses for narrow-output-channel 3×3 convs at slide
scale (measured v5e @3072×4096: dec block3 128→32 runs 8.7 TFLOP/s, the
s2d block4 tail 14.3 — see scripts/profile_fast.py), because N=Cout < 128
starves the MXU output lanes AND the lowering adds relayout passes. This
kernel keeps the conv at its native formulation but feeds the MXU
directly:

* a (BR+2, WC+16, C) input row-window is DMA'd HBM→VMEM per grid step
  (rows overlap 2/BR — the only traffic overhead);
* the nine taps are lane-aligned ``pltpu.roll`` shifts of the resident
  window (dy = row offset into the window, dx = sublane roll along W),
  each contracted against a (C, N) weight slice on the MXU with float32
  accumulation;
* BN scale is folded into the weights host-side; bias + optional ReLU
  fuse into the epilogue; output is written bf16.

Unlike round-1's ``ops/pallas_conv.py`` (kept as a documented negative
result) there is NO host-graph halo materialization and NO float32
output — the only HBM traffic is x once (+row halo), w once, out once.

Capability twin of the reference's decoder convs (smp Unet blocks,
reference train.py:29); used by ``models/fast_decoder`` for the dense
whole-slide inference tail.

Round-2 measured notes (v5e, see CLAUDE.md for the full cliff list):
``conv_chain`` reaches 48-78 TFLOP/s on the decoder-tail stage groups
with mask_mode="none"; every in-kernel border-masking variant tried
(iota/where, gated strip stores, mask-vector multiplies) triggers a
Mosaic compile-time/runtime cliff, and the remote compile helper costs
minutes per kernel — so the chains ship opt-in behind
``DenseInferenceEngine.fcn_fold`` while the default dense path stays on
the XLA s2d tail. The diagnostic mask modes ("rows"/"cm"/"bcast1") are
kept for future bisection.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv9_kernel(x_hbm, w_ref, b_ref, out_ref, scratch, sem, *,
                  br: int, wc: int, relu: bool):
    # double-buffered input pipeline: per-grid-step serialization (DMA
    # wait → compute → out copy) costs ~28 µs/step on v5e regardless of
    # the dot count (scripts/probe_dot.py: 1 tap and 9 taps take the same
    # time), so the input DMA for step k+1 is started before computing
    # step k
    i = pl.program_id(0)
    j = pl.program_id(1)
    ny = pl.num_programs(0)
    nx = pl.num_programs(1)
    wcp = scratch.shape[2]
    k = i * nx + j

    def dma(step, slot):
        bi = step // nx
        bj = step % nx
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(bi * br, br + 2), pl.ds(bj * wc, wcp)],
            scratch.at[slot], sem.at[slot])

    @pl.when(k == 0)
    def _():
        dma(0, 0).start()

    @pl.when(k + 1 < ny * nx)
    def _():
        dma(k + 1, (k + 1) % 2).start()

    dma(k, k % 2).wait()
    win = scratch[k % 2]

    acc = None
    for dx in range(3):
        # ONE unaligned sublane slice per dx (a relayout copy — fine on
        # Mosaic, scripts/probe_mosaic.py P1; 3D rolls are not); the dy
        # taps then row-slice the copied VALUE on its untiled outer dim,
        # which is free.
        a = win[:, dx:dx + wc]                           # (br+2, wc, C)
        for dy in range(3):
            part = jax.lax.dot_general(
                a[dy:dy + br], w_ref[3 * dy + dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (br, wc, N)
            acc = part if acc is None else acc + part

    y = acc + b_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


def _pad_input(x: jnp.ndarray, hp: int, wp: int) -> jnp.ndarray:
    """Zero-pad (H, W, C) → (hp+2, wp+16, C) with the conv's 1-px halo at
    row/col 0 (SAME zero padding) and alignment slack on the right."""
    h, w, _ = x.shape
    return jnp.pad(x, ((1, hp + 1 - h), (1, wp + 15 - w), (0, 0)))


@partial(jax.jit, static_argnames=("br", "wc", "relu", "out_dtype",
                                   "interpret"))
def _conv9_padded(xp, w9, bias, *, br, wc, relu, out_dtype, interpret):
    hp = xp.shape[0] - 2
    ny, nx = hp // br, (xp.shape[1] - 16) // wc
    c = xp.shape[2]
    n = w9.shape[2]
    kern = partial(_conv9_kernel, br=br, wc=wc, relu=relu)
    return pl.pallas_call(
        kern,
        grid=(ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x: manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w9 (9, C, N)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias (1, N)
        ],
        out_specs=pl.BlockSpec((br, wc, n), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, nx * wc, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, br + 2, wc + 16, c), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xp, w9, bias)


def conv9(x: jnp.ndarray, kernel: jnp.ndarray,
          scale=None, bias=None, relu: bool = False,
          br: int = 8, wc: int = 1024,
          out_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """SAME 3×3/1 conv with fused affine epilogue.

    x: (H, W, Cin) bf16/f32; kernel: (3, 3, Cin, Cout).
    Computes ``relu((conv(x, kernel)) * scale + bias)`` with f32
    accumulation — ``scale`` is folded into the weights host-side.
    Returns (H, W, Cout) ``out_dtype``.
    """
    h, w, cin = x.shape
    n = kernel.shape[3]
    wc = min(wc, w + (-w) % 16)
    hp = h + (-h) % br
    wp = w + (-w) % wc

    kf = kernel.astype(jnp.float32)
    if scale is not None:
        kf = kf * scale.astype(jnp.float32)
    cp = cin + (-cin) % 128
    if cp != cin:
        # manual-DMA slices of a lane-tiled HBM ref need 128-multiple
        # lanes; sub-128 buffers are stored lane-padded by Mosaic anyway,
        # so the explicit pad costs little extra HBM traffic
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - cin)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, cp - cin), (0, 0)))
        cin = cp
    w9 = kf.reshape(9, cin, n).astype(x.dtype)
    b = (jnp.zeros((n,), jnp.float32) if bias is None
         else bias.astype(jnp.float32)).reshape(1, n)

    xp = _pad_input(x, hp, wp)
    out = _conv9_padded(xp, w9, b, br=br, wc=wc, relu=relu,
                        out_dtype=out_dtype, interpret=interpret)
    return out[:h, :w]


def _chain_kernel(x_hbm, cmask_ref, *wb_refs, br: int, wc: int, wcp: int,
                  h: int, w: int, relus, sem, scratch, ybuf, out_ref,
                  mask_mode: str = "full", planar_out: bool = False):
    """Fused L-layer 3×3 conv chain: one input window DMA, all
    intermediates VMEM-resident, one output write.

    ``wb_refs`` = (w9_0, b_0, w9_1, b_1, ...). The window carries an
    L-deep halo; after each inner layer, rows/cols outside the true image
    rectangle are re-zeroed so the next conv sees XLA's zero-padding
    semantics (conv-of-pad ≠ pad-of-conv at borders otherwise)."""
    L = len(relus)
    i = pl.program_id(0)
    j = pl.program_id(1)
    nx = pl.num_programs(1)
    k = i * nx + j

    def dma(step, slot):
        bi = step // nx
        bj = step % nx
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(bi * br, br + 2 * L), pl.ds(bj * wc, wcp)],
            scratch.at[slot], sem.at[slot])

    @pl.when(k == 0)
    def _():
        dma(0, 0).start()

    @pl.when(k + 1 < pl.num_programs(0) * nx)
    def _():
        dma(k + 1, (k + 1) % 2).start()

    dma(k, k % 2).wait()

    for l in range(L):
        w9 = wb_refs[2 * l]
        bias = wb_refs[2 * l + 1]
        rows = br + 2 * (L - l) - 2           # rows after this layer
        # col extents stay 8-ALIGNED at every layer (8-col margin instead
        # of the exact 2): unaligned sublane extents on VMEM ref stores/
        # loads blow up Mosaic compile time (>20 min for one kernel)
        cols = wc + 8 * (L - l)               # output extent, 8-aligned
        cl = w9.shape[1]
        if l == 0:
            cur = scratch[k % 2]              # (br+2L, wcp, C0)
        else:
            # round-trip each layer through a VMEM ref: value-chained
            # layers explode Mosaic register allocation (compile >10min
            # and 4.6x slower code); ref-staged layers keep the inner
            # structure identical to the fast conv9 single kernel
            cur = ybuf[(l - 1) % 2, :rows + 2, :cols + 8, :cl]
        acc = None
        for dx in range(3):
            a = cur[:, dx:dx + cols]          # (rows+2, cols, C)
            for dy in range(3):
                part = jax.lax.dot_general(
                    a[dy:dy + rows], w9[3 * dy + dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        y = acc + bias[0]
        if relus[l]:
            y = jnp.maximum(y, 0.0)
        if l + 1 < L:
            # zero out-of-image rows/cols (absolute frame of this layer:
            # rows start at i*br - (L-l-1), cols at j*wc - (L-l-1));
            # needed only where the frame can leave the image rectangle
            d = L - l - 1
            r0 = i * br - d
            c0 = j * wc - d
            if mask_mode in ("edges", "rows", "cm"):
                # out-of-image COLS: multiply by a precomputed 0/1 mask
                # vector slice (aligned extent, outer-dim broadcast only —
                # iota/where value masks cost a constant ~130 ms/call and
                # a 25-250x compile blowup; sub-8 gated col stores hit the
                # same compile cliff). Out-of-image ROWS: gated stores
                # with full-width (aligned) extents — the row dim is the
                # untiled outer dim, so any extent is fine.
                cl_o = y.shape[-1]
                if mask_mode in ("edges", "cm"):
                    # per-layer pre-shifted masks: the slice start j*wc
                    # is provably 8-aligned (wc is a multiple of 8)
                    cm = cmask_ref[l, pl.ds(j * wc, cols), :cl_o]
                    y = y * cm[None]
                ybuf[l % 2, :rows, :cols, :cl_o] = y.astype(ybuf.dtype)
                if mask_mode in ("edges", "rows"):
                    ny = pl.num_programs(0)
                    hp = ny * br
                    # top strip: frame rows [0, d) are absolute rows < 0
                    @pl.when(i == 0)
                    def _():
                        ybuf[l % 2, 0:d, :cols, :cl_o] = jnp.zeros(
                            (d, cols, cl_o), ybuf.dtype)

                    # bottom strips: absolute rows >= h (any h % br)
                    for blk, over in ((ny - 1, hp - h + d),
                                      (ny - 2, hp - h + d - br)):
                        k0 = rows - over
                        if over <= 0 or blk < 0 or k0 < 0:
                            continue

                        @pl.when(i == blk)
                        def _(k0=k0, over=over):
                            ybuf[l % 2, k0:k0 + over, :cols, :cl_o] = \
                                jnp.zeros((over, cols, cl_o), ybuf.dtype)
                continue
            if mask_mode == "full":
                sh = (rows, cols, y.shape[-1])
                rr = jax.lax.broadcasted_iota(jnp.int32, sh, 0) + r0
                cc = jax.lax.broadcasted_iota(jnp.int32, sh, 1) + c0
                ok = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
                y = jnp.where(ok, y, 0.0)
            elif mask_mode == "bcast1":
                rr = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, cols, 1), 0) + r0
                cc = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, cols, 1), 1) + c0
                ok = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
                y = jnp.where(ok, y, 0.0)
            # "none": skip (INEXACT at image borders; measurement only)
            ybuf[l % 2, :rows, :cols, :y.shape[-1]] = \
                y.astype(ybuf.dtype)
    if planar_out:                           # (C, br, wc) output layout
        out_ref[:] = jnp.transpose(y[:, :wc], (2, 0, 1)
                                   ).astype(out_ref.dtype)
    else:
        out_ref[:] = y[:, :wc].astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("br", "wc", "h", "w", "relus",
                                   "out_dtype", "interpret", "mask_mode",
                                   "planar_out"))
def _chain_padded(xp, cmask, wbs, *, br, wc, h, w, relus, out_dtype,
                  interpret, mask_mode="full", planar_out=False):
    L = len(relus)
    hp = xp.shape[0] - 2 * L
    ny = hp // br
    # window cols per grid step: 8-col margin per layer keeps every
    # store/load extent sublane-aligned (Mosaic compile-time cliff)
    wcp_step = wc + 8 * L + 8
    nx = (xp.shape[1] - wcp_step + wc) // wc
    c0 = xp.shape[2]
    n_out = wbs[-2].shape[2]
    # ping-pong intermediate buffer sized to the largest inner layer
    max_inner = max([w.shape[2] for w in wbs[:-2:2]] or [1])
    flat = []
    for l in range(L):
        flat += [wbs[2 * l], wbs[2 * l + 1]]
    kern = partial(_chain_kernel, br=br, wc=wc, wcp=wcp_step, h=h, w=w,
                   relus=relus, mask_mode=mask_mode, planar_out=planar_out)

    def body(x_hbm, cmask_ref, *wb_and_out):
        wb = wb_and_out[:-4]
        out_ref, scratch, ybuf, sem = wb_and_out[-4:]
        kern(x_hbm, cmask_ref, *wb, out_ref=out_ref, scratch=scratch,
             ybuf=ybuf, sem=sem)

    return pl.pallas_call(
        body,
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]    # col mask
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * L),
        out_specs=(pl.BlockSpec((n_out, br, wc), lambda i, j: (0, i, j),
                                memory_space=pltpu.VMEM) if planar_out
                   else pl.BlockSpec((br, wc, n_out),
                                     lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct(
            (n_out, hp, nx * wc) if planar_out else (hp, nx * wc, n_out),
            out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, br + 2 * L, wcp_step, c0), xp.dtype),
            pltpu.VMEM((2, br + 2 * L - 2, wc + 8 * L, max_inner),
                       xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the chain's f32 accumulator temps overflow the default 16 MB
            # scoped window; v5e has 128 MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, cmask, *flat)


def conv_chain(x: jnp.ndarray, layers, br: int = 8, wc: int = 512,
               out_dtype=jnp.bfloat16, interpret: bool = False,
               mask_mode: str = "auto", pad_inner: bool = True,
               pad_out: bool = False,
               planar_out: bool = False) -> jnp.ndarray:
    """Fused chain of SAME 3×3/1 convs with affine+ReLU epilogues.

    ``layers``: sequence of ``(kernel (3,3,Ci,Co), scale|None, bias|None,
    relu)``. Equivalent to applying :func:`conv9` per layer (bf16
    intermediates, f32 accumulation) but with ONE HBM round-trip: the
    input window carries an L-deep halo, every intermediate stays in
    VMEM, and only the last layer's activations are written back. Border
    zero-padding semantics match XLA per-layer SAME padding exactly
    (interior halo values are re-zeroed between layers).

    ``mask_mode="auto"`` resolves to the cheap gated edge-strip masking
    ("edges": measured 7.4 ms vs 136 ms for the iota/where "full" mode on
    v5e) when the geometry allows (h % br == 0 and a power-of-two block
    split of w), else to "full" (any dims; interpret/CPU tests).

    ``wc`` is a TARGET block width, not a guarantee: it is clamped to 320
    (block widths >= ~512 hit a Mosaic compile-time cliff), overridden to
    128/256 for ``planar_out`` (planar blocks must divide (8, 128)), and
    then rebalanced so the last column block carries minimal padding.

    Capability twin of the reference decoder's chained conv+BN+ReLU
    blocks (smp Unet via train.py:29) for the dense-inference tail.
    """
    h, w, cin = x.shape
    L = len(layers)
    # the edges-mode bottom masking zeroes out-of-image rows with two
    # gated strips (grid rows ny-1, ny-2) — valid only while the halo
    # depth d = L-1 stays below br; fail loudly instead of silently
    # corrupting border rows for deeper chains
    if L - 1 > br:
        raise ValueError(f"conv_chain: halo depth {L - 1} > br={br}")
    ci0 = layers[0][0].shape[2]
    if cin > ci0:
        # caller passes a lane-padded input (e.g. a chain that emitted
        # pad_out=True); zero-extend the first kernel's input channels
        layers = [tuple(l) for l in layers]
        layers[0] = (jnp.pad(layers[0][0],
                             ((0, 0), (0, 0), (0, cin - ci0), (0, 0))),
                     ) + tuple(layers[0][1:])
    if mask_mode == "auto":
        # edges mode has no geometric preconditions (rows handled by
        # gated full-width stores incl. h % br != 0 overhang; cols by the
        # mask-vector multiply); L == 1 needs no masking at all
        mask_mode = "none" if L == 1 else "edges"
    wc = min(wc, 320)                        # block widths ≥ ~512 hit a
    #                                          Mosaic compile-time cliff
    layers = [tuple(l) for l in layers]
    wbs = []
    for li in range(L):
        kernel, scale, bias, relu = layers[li]
        ci, n = kernel.shape[2], kernel.shape[3]
        kf = kernel.astype(jnp.float32)
        if scale is not None:
            kf = kf * scale.astype(jnp.float32)
        b = (jnp.zeros((n,), jnp.float32) if bias is None
             else bias.astype(jnp.float32)).reshape(1, n)
        if (pad_inner and li + 1 < L and n % 128) or \
                (pad_out and li + 1 == L and n % 128):
            # keep INTERMEDIATE values lane-native: sub-128-lane vectors
            # relayout pathologically on Mosaic (measured: a 64-lane
            # 3-conv chain runs 4.6x slower than unpadded singles). The
            # padded output channels are zero; the next layer's matching
            # zero input rows contribute nothing — exact math.
            npad = -n % 128
            kf = jnp.pad(kf, ((0, 0), (0, 0), (0, 0), (0, npad)))
            b = jnp.pad(b, ((0, 0), (0, npad)))
            if li + 1 < L:
                nxt = layers[li + 1][0]
                layers[li + 1] = (jnp.pad(nxt, ((0, 0), (0, 0), (0, npad),
                                                (0, 0))),
                                  ) + layers[li + 1][1:]
            n += npad
        wbs += [kf.reshape(9, ci, n), b]

    # lane-pad the input channels (manual-DMA constraint, see conv9)
    cp = cin + (-cin) % 128
    if cp != cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - cin)))
        wbs[0] = jnp.pad(wbs[0], ((0, 0), (0, cp - cin), (0, 0)))
    wbs[0] = wbs[0].astype(x.dtype)
    for l in range(1, L):
        wbs[2 * l] = wbs[2 * l].astype(x.dtype)

    # choose nx to minimize right padding (wc is a TARGET block width:
    # e.g. w=544 with wc=512 becomes 2 blocks of 272, not 2×512 with 47%
    # pad), then pad spatially: L-deep halo top/left, (align+L) bottom/right
    if planar_out:
        # planar blocks are (C, br, wc): the trailing dims must divide
        # (8, 128), so wc is a 128-multiple
        wc = 256 if w >= 256 else 128
        nx = -(-w // wc)
    else:
        nx = -(-w // wc)
        wc = -(-(-(-w // nx)) // 8) * 8  # ceil(ceil(w/nx) / 8) * 8
    wp = nx * wc
    hp = h + (-h) % br
    # right slack: the last block's window is wc + 8L + 8 wide
    slack = 8 * L + 8 - 2 * L
    xp = jnp.pad(x, ((L, hp + L - h), (L, wp + L - w + slack), (0, 0)))
    relus = tuple(bool(r) for (_, _, _, r) in layers)
    # per-inner-layer 0/1 column masks for the edges-mode in-kernel
    # multiply, PRE-SHIFTED so the kernel slices at the provably-aligned
    # offset j*wc: mask l row r covers frame col t = r at xp col
    # j*wc + (l+1) + t, i.e. absolute col r + l + 1 - L
    cmax = max([wb.shape[2] for wb in wbs[:-2:2]] or [128])
    nmask = max(L - 1, 1)
    cmask = np.zeros((nmask, xp.shape[1], max(cmax, 128)), np.float32)
    for l in range(nmask):
        lo = max(0, L - l - 1)
        cmask[l, lo:lo + w] = 1.0
    cmask = jnp.asarray(cmask, jnp.bfloat16)
    out = _chain_padded(xp, cmask, tuple(wbs), br=br, wc=wc, h=h, w=w,
                        relus=relus, out_dtype=out_dtype,
                        interpret=interpret, mask_mode=mask_mode,
                        planar_out=planar_out)
    if planar_out:
        return out[:, :h, :w]                # (C, H, W)
    return out[:h, :w]


def conv9_ref(x, kernel, scale=None, bias=None, relu=False):
    """numpy/jnp oracle for tests."""
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), kernel.astype(jnp.float32), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y
