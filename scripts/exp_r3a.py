"""Round-3 perf probes: s2d-domain variants for the three hot regions.

Regions (fresh r2-end profile at 3072x4096, FULL ~86 ms + post):
  1. encoder layer1  ~21 ms  (64-ch convs @ H/4 — lane-starved)
  2. decoder block2/3        (64/32-ch convs @ H/4, H/2)
  3. block4+head s2d  ~57 ms (the dominant block)

Variants are timed per region in ONE process (remote compiles amortized).
Run with --check on CPU first: every transformed variant is asserted
against the native math at tiny dims before any TPU time is spent.

Usage:
  python scripts/exp_r3a.py --check          # CPU parity of transforms
  nohup python scripts/exp_r3a.py > /tmp/exp_r3a.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHECK = "--check" in sys.argv

if CHECK:
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp


# ---------------------------------------------------------------- transforms

def _s2d_route(f: int) -> np.ndarray:
    route = np.zeros((3, 3, 3, 3, f * f, f * f), np.float32)
    for a in range(f):
        for b in range(f):
            for dy in range(3):
                du, by = divmod(a + dy - 1, f)
                if not (-1 <= du <= 1):
                    continue
                for dx in range(3):
                    dv, bx = divmod(b + dx - 1, f)
                    if not (-1 <= dv <= 1):
                        continue
                    route[dy, dx, du + 1, dv + 1,
                          by * f + bx, a * f + b] = 1.0
    return route


def s2d_kernel_f(w, f):
    kh, kw, cin, cout = w.shape
    route = _s2d_route(f)
    out = jnp.einsum("yxuvio,yxcm->uvicom", jnp.asarray(route, w.dtype), w)
    return out.reshape(3, 3, f * f * cin, f * f * cout)


def upfold_kernel(w):
    route = _s2d_route(2).sum(axis=4)
    out = jnp.einsum("yxuvo,yxcm->uvcom", jnp.asarray(route, w.dtype), w)
    return out.reshape(3, 3, w.shape[2], 4 * w.shape[3])


def _upfold2_route() -> np.ndarray:
    """conv3x3(upsample2x(x_half)) with x_half in s2d(2) layout (cells at
    the output's quarter grid) -> output in s2d(4) layout on the SAME cell
    grid. (3,3) taps -> (3,3) cell taps, 4*Cin -> 16*Cout."""
    route = np.zeros((3, 3, 3, 3, 4, 16), np.float32)
    for a in range(4):
        for b in range(4):
            for dy in range(3):
                du, al = divmod((a + dy - 1) // 2, 2)
                if not (-1 <= du <= 1):
                    continue
                for dx in range(3):
                    dv, be = divmod((b + dx - 1) // 2, 2)
                    if not (-1 <= dv <= 1):
                        continue
                    route[dy, dx, du + 1, dv + 1, al * 2 + be,
                          a * 4 + b] = 1.0
    return route


def upfold2_kernel(w):
    """(3,3,Cin,Cout) -> (3,3,4Cin,16Cout): conv(upsample2x(.)) taking
    s2d(2)-layout input to s2d(4)-layout output (shared cell grid)."""
    cin, cout = w.shape[2], w.shape[3]
    route = _upfold2_route()
    out = jnp.einsum("yxuvio,yxcm->uvicom", jnp.asarray(route, w.dtype), w)
    return out.reshape(3, 3, 4 * cin, 16 * cout)


def s2d_stride2_kernel(w):
    """(3,3,Cin,Cout) stride-2 pad-1 conv -> (2,2,4Cin,Cout) stride-1 conv
    over s2d(2) cells with padding ((1,0),(1,0))."""
    cin, cout = w.shape[2], w.shape[3]
    route = np.zeros((3, 3, 2, 2, 4), np.float32)
    for dy in range(3):
        du, al = divmod(dy - 1, 2)
        for dx in range(3):
            dv, be = divmod(dx - 1, 2)
            route[dy, dx, du + 1, dv + 1, al * 2 + be] = 1.0
    out = jnp.einsum("yxuvi,yxcm->uvicm", jnp.asarray(route, w.dtype), w)
    return out.reshape(2, 2, 4 * cin, cout)


def space_to_depth(x, f=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x, f=2):
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, f * h, f * w, c)


def s2d4_to_s2d2(x):
    """(B, H/4, W/4, 16C) s2d(4) layout -> (B, H/2, W/2, 4C) s2d(2).
    Channel factorization (a,b,c) with a=2a1+a0: (a1,b1) move to spatial,
    (a0,b0) stay as the s2d(2) position."""
    b, h, w, cf = x.shape
    c = cf // 16
    x = x.reshape(b, h, w, 2, 2, 2, 2, c)      # I, J, a1, a0, b1, b0, c
    x = jnp.transpose(x, (0, 1, 3, 2, 5, 4, 6, 7))
    return x.reshape(b, 2 * h, 2 * w, 4 * c)


def upsample2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def conv(x, k, stride=1, padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def tilef(v, f2):
    return jnp.tile(v, f2)


# ---------------------------------------------------------------- checks

def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def run_checks():
    ok = True

    def report(name, a, b, tol=1e-4):
        nonlocal ok
        err = float(jnp.max(jnp.abs(a - b)))
        good = err < tol
        ok &= good
        print(f"  {name:40s} maxerr={err:.2e} {'OK' if good else 'FAIL'}")

    # s2d_kernel_f f=4
    x = _rand((1, 16, 24, 3), 0)
    w = _rand((3, 3, 3, 5), 1)
    ref = conv(x, w)
    xs = space_to_depth(x, 4)
    ys = conv(xs, s2d_kernel_f(w, 4))
    report("s2d_kernel_f(4)", depth_to_space(ys, 4), ref)

    # upfold2: conv(upsample2x(x_half)) from s2d(2) input to s2d(4) out
    xh = _rand((1, 8, 12, 3), 2)
    ref = conv(upsample2x(xh), w)             # (1, 16, 24, 5)
    xs2 = space_to_depth(xh, 2)               # cells 4x6 == quarter grid
    ys4 = conv(xs2, upfold2_kernel(w))
    report("upfold2_kernel", depth_to_space(ys4, 4), ref)

    # s2d_stride2: stride-2 pad-1 conv from s2d(2) input
    x = _rand((1, 16, 24, 3), 3)
    ref = conv(x, w, stride=2)                # (1, 8, 12, 5)
    xs = space_to_depth(x, 2)
    ys = conv(xs, s2d_stride2_kernel(w), padding=((1, 0), (1, 0)))
    report("s2d_stride2_kernel", ys, ref)

    # s2d(4) -> s2d(2) relayout
    x = _rand((1, 16, 24, 3), 7)
    report("s2d4_to_s2d2", s2d4_to_s2d2(space_to_depth(x, 4)),
           space_to_depth(x, 2))

    # residual block in s2d domain
    w1 = _rand((3, 3, 3, 3), 4)
    w2 = _rand((3, 3, 3, 3), 5)
    ref = jax.nn.relu(conv(jax.nn.relu(conv(x, w1)), w2) + x)
    xs = space_to_depth(x, 2)
    ys = jax.nn.relu(conv(jax.nn.relu(conv(xs, s2d_kernel_f(w1, 2))),
                          s2d_kernel_f(w2, 2)) + xs)
    report("residual block s2d", depth_to_space(ys, 2), ref)

    print("ALL OK" if ok else "FAILURES", flush=True)
    return ok


# ---------------------------------------------------------------- timing

def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., :1, :1]
                         .astype(jnp.float32)))


def bench(name, fn, *args, iters=5, flops=None):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / iters
    extra = f"  {flops / dt / 1e12:8.2f} TFLOP/s" if flops else ""
    print(f"{name:52s} {dt * 1e3:9.2f} ms{extra}", flush=True)
    return dt


def run_timings():
    H, W = 3072, 4096
    H2, W2, H4, W4, H8, W8 = H // 2, W // 2, H // 4, W // 4, H // 8, W // 8
    bf = jnp.bfloat16
    r = np.random.RandomState(0)

    def arr(shape, dtype=bf):
        return jnp.asarray(r.rand(*shape).astype(np.float32) * 0.1,
                           dtype=dtype)

    print(f"platform: {jax.devices()[0].platform}", flush=True)

    # ---------------- region 1: encoder layer1 (2 residual blocks, 64ch @H/4)
    x4 = arr((1, H4, W4, 64))
    ws = [arr((3, 3, 64, 64)) for _ in range(4)]
    fl_l1 = 4 * 9 * 64 * 64 * H4 * W4 * 2

    @jax.jit
    def l1_native(x):
        for j in (0, 1):
            idn = x
            y = jax.nn.relu(conv(x, ws[2 * j]).astype(bf))
            y = conv(y, ws[2 * j + 1])
            x = jax.nn.relu(y + idn.astype(jnp.float32)).astype(bf)
        return x

    bench("L1 native (64ch @H/4)", l1_native, x4, flops=fl_l1)

    xs8 = arr((1, H8, W8, 256))
    ws_s = [s2d_kernel_f(w, 2) for w in ws]

    @jax.jit
    def l1_s2d(x):
        for j in (0, 1):
            idn = x
            y = jax.nn.relu(conv(x, ws_s[2 * j]).astype(bf))
            y = conv(y, ws_s[2 * j + 1])
            x = jax.nn.relu(y + idn.astype(jnp.float32)).astype(bf)
        return x

    bench("L1 s2d(2) (256ch @H/8)", l1_s2d, xs8, flops=fl_l1)

    # include the relayout cost: native in -> s2d -> blocks -> keep s2d
    @jax.jit
    def l1_s2d_in(x):
        return l1_s2d.__wrapped__(space_to_depth(x))

    bench("L1 s2d(2) incl s2d-in", l1_s2d_in, x4, flops=fl_l1)

    # ---------------- region 2: decoder block2 + block3
    # block2 native: in concat(up(128@H/8) -> 128@H/4, skip 64@H/4) = 192
    b1o = arr((1, H8, W8, 128))
    c2 = arr((1, H4, W4, 64))
    w21 = arr((3, 3, 192, 64))
    w22 = arr((3, 3, 64, 64))
    fl_b2 = (9 * 192 * 64 + 9 * 64 * 64) * H4 * W4 * 2

    @jax.jit
    def b2_native(b1o, c2):
        x = jnp.concatenate([upsample2x(b1o), c2], axis=-1)
        x = jax.nn.relu(conv(x, w21)).astype(bf)
        return jax.nn.relu(conv(x, w22)).astype(bf)

    bench("B2 native (192->64->64 @H/4)", b2_native, b1o, c2, flops=fl_b2)

    # block2 s2d: conv1 = upfold(up-part) + s2d(skip-part), out 256 @H/8
    k21 = jnp.concatenate([upfold_kernel(w21[:, :, :128]),
                           s2d_kernel_f(w21[:, :, 128:], 2)], axis=2)
    k22 = s2d_kernel_f(w22, 2)
    c2s = arr((1, H8, W8, 256))

    @jax.jit
    def b2_s2d(b1o, c2s):
        x = jnp.concatenate([b1o, c2s], axis=-1)   # (H/8, 384)
        x = jax.nn.relu(conv(x, k21)).astype(bf)
        return jax.nn.relu(conv(x, k22)).astype(bf)

    bench("B2 s2d (384->256->256 @H/8)", b2_s2d, b1o, c2s, flops=fl_b2)

    # block3 native: in concat(up(64@H/4)->64@H/2, skip 64@H/2) = 128 -> 32
    b2o = arr((1, H4, W4, 64))
    c1 = arr((1, H2, W2, 64))
    w31 = arr((3, 3, 128, 32))
    w32 = arr((3, 3, 32, 32))
    fl_b3 = (9 * 128 * 32 + 9 * 32 * 32) * H2 * W2 * 2

    @jax.jit
    def b3_native(b2o, c1):
        x = jnp.concatenate([upsample2x(b2o), c1], axis=-1)
        x = jax.nn.relu(conv(x, w31)).astype(bf)
        return jax.nn.relu(conv(x, w32)).astype(bf)

    bench("B3 native (128->32->32 @H/2)", b3_native, b2o, c1, flops=fl_b3)

    # block3 s2d: cells H/4, out 128
    k31 = jnp.concatenate([upfold_kernel(w31[:, :, :64]),
                           s2d_kernel_f(w31[:, :, 64:], 2)], axis=2)
    k32 = s2d_kernel_f(w32, 2)
    c1s = arr((1, H4, W4, 256))

    @jax.jit
    def b3_s2d(b2o, c1s):
        x = jnp.concatenate([b2o, c1s], axis=-1)   # (H/4, 320)
        x = jax.nn.relu(conv(x, k31)).astype(bf)
        return jax.nn.relu(conv(x, k32)).astype(bf)

    bench("B3 s2d (320->128->128 @H/4)", b3_s2d, b2o, c1s, flops=fl_b3)

    # with s2d of the c1 skip included (it arrives native from the stem)
    @jax.jit
    def b3_s2d_in(b2o, c1):
        return b3_s2d.__wrapped__(b2o, space_to_depth(c1))

    bench("B3 s2d incl skip s2d-in", b3_s2d_in, b2o, c1, flops=fl_b3)

    # ---------------- region 3: block4 + head
    b3o = arr((1, H2, W2, 32))        # native block3 out
    b3s = arr((1, H4, W4, 128))       # s2d block3 out
    w41 = arr((3, 3, 32, 16))
    w42 = arr((3, 3, 16, 16))
    wh = arr((3, 3, 16, 4))
    fl_b4 = (9 * 32 * 16 + 9 * 16 * 16 + 9 * 16 * 4) * H * W * 2

    # current: upfold conv1 + s2d conv2 + s2d head, all @H/2 cells
    k41u = upfold_kernel(w41)
    k42s = s2d_kernel_f(w42, 2)
    khs = s2d_kernel_f(wh, 2)

    @jax.jit
    def b4_cur(x):
        x = jax.nn.relu(conv(x, k41u)).astype(bf)
        x = jax.nn.relu(conv(x, k42s)).astype(bf)
        return conv(x, khs)                        # f32 (H/2, W/2, 16)

    bench("B4+head cur s2d(2) @H/2 (f32 out)", b4_cur, b3o, flops=fl_b4)

    @jax.jit
    def b4_cur_bf(x):
        x = jax.nn.relu(conv(x, k41u)).astype(bf)
        x = jax.nn.relu(conv(x, k42s)).astype(bf)
        return conv(x, khs).astype(bf)

    bench("B4+head cur s2d(2) (bf16 out)", b4_cur_bf, b3o, flops=fl_b4)

    # per-conv breakdown of current
    x41 = arr((1, H2, W2, 64))
    bench("  b4 conv1 upfold (32->64 @H/2)", jax.jit(
        lambda x: jax.nn.relu(conv(x, k41u)).astype(bf)), b3o,
        flops=9 * 32 * 64 * H2 * W2 * 2)
    bench("  b4 conv2 s2d (64->64 @H/2)", jax.jit(
        lambda x: jax.nn.relu(conv(x, k42s)).astype(bf)), x41,
        flops=9 * 64 * 64 * H2 * W2 * 2)
    bench("  head s2d (64->16 @H/2 f32)", jax.jit(
        lambda x: conv(x, khs)), x41,
        flops=9 * 64 * 16 * H2 * W2 * 2)

    # s2d(4) route: conv1 via upfold2 from s2d block3 out, conv2+head s2d(4)
    k41u2 = upfold2_kernel(w41)                    # (3,3,128,256)
    k42s4 = s2d_kernel_f(w42, 4)                   # (3,3,256,256)
    khs4 = s2d_kernel_f(wh, 4)                     # (3,3,256,64)

    @jax.jit
    def b4_s2d4(x):
        x = jax.nn.relu(conv(x, k41u2)).astype(bf)
        x = jax.nn.relu(conv(x, k42s4)).astype(bf)
        return conv(x, khs4)                       # f32 (H/4, W/4, 64)

    bench("B4+head s2d(4) @H/4 (f32 out)", b4_s2d4, b3s, flops=fl_b4)

    @jax.jit
    def b4_s2d4_bf(x):
        x = jax.nn.relu(conv(x, k41u2)).astype(bf)
        x = jax.nn.relu(conv(x, k42s4)).astype(bf)
        return conv(x, khs4).astype(bf)

    bench("B4+head s2d(4) (bf16 out)", b4_s2d4_bf, b3s, flops=fl_b4)

    bench("  b4 conv1 upfold2 (128->256 @H/4)", jax.jit(
        lambda x: jax.nn.relu(conv(x, k41u2)).astype(bf)), b3s,
        flops=9 * 128 * 256 * H4 * W4 * 2)
    x42 = arr((1, H4, W4, 256))
    bench("  b4 conv2 s2d4 (256->256 @H/4)", jax.jit(
        lambda x: jax.nn.relu(conv(x, k42s4)).astype(bf)), x42,
        flops=9 * 256 * 256 * H4 * W4 * 2)
    bench("  head s2d4 (256->64 @H/4 f32)", jax.jit(
        lambda x: conv(x, khs4)), x42,
        flops=9 * 256 * 64 * H4 * W4 * 2)

    # mixed: conv1 upfold2 -> relayout s2d(4)->s2d(2) -> conv2+head s2d(2)
    @jax.jit
    def b4_mixed(x):
        x = jax.nn.relu(conv(x, k41u2)).astype(bf)    # (H/4, 256) s2d(4)
        x = s2d4_to_s2d2(x)                           # (H/2, 64) s2d(2)
        x = jax.nn.relu(conv(x, k42s)).astype(bf)
        return conv(x, khs)

    bench("B4 mixed: upfold2 + relayout + s2d(2)", b4_mixed, b3s,
          flops=fl_b4)

    bench("  s2d4->s2d2 relayout alone", jax.jit(s2d4_to_s2d2), x42)

    print("done", flush=True)


if __name__ == "__main__":
    if CHECK:
        sys.exit(0 if run_checks() else 1)
    run_timings()
