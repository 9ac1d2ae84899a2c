"""Micro-benchmarks of the denoise hot path on the current backend.

Transport gotcha (measured): through the axon tunnel,
`block_until_ready` does NOT synchronize — only a data fetch does; and
the execution stream applies dispatch backpressure, so N dispatches +
one final fetch measures N real executions. Every timing below uses
that protocol, with ops loop-chained inside one program to amortize
per-dispatch overhead. FLOPs are computed analytically (XLA
cost_analysis counts a fori_loop body once).

Also times full-UNet ablations (no temporal / no spatial+audio attn /
resnets-only) to attribute the denoise budget per op family — the
profile substitute, since jax.profiler cannot reach the tunneled
device (VERDICT r01 weak #1).

Usage: python -m scripts.micro_probe [--which attn|conv|gn|unet|ablate]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def fetch_sync(x):
    """The only true synchronization on this transport: fetch one element."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def bench_loop(name, step_fn, x0, flops_per_iter, iters=20, rounds=3,
               const_args=()):
    """Time `iters` chained applications of step_fn inside one jit,
    repeated `rounds` times with one trailing fetch.

    Large operands (e.g. a full params tree) MUST ride `const_args`, not
    a closure: closed-over device arrays are baked into the jaxpr as
    constants, and a multi-GB constant blob blows up the tunneled
    remote-compile payload (observed: 2.5 GB lowering warning, then the
    compile wedges/breaks the pipe)."""

    @jax.jit
    def run(x, *cargs):
        return jax.lax.fori_loop(
            0, iters, lambda i, y: step_fn(y, *cargs), x)

    compiled = run.lower(x0, *const_args).compile()
    out = compiled(x0, *const_args)
    fetch_sync(out)  # compile + warmup barrier
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = compiled(out, *const_args)
    fetch_sync(out)
    t = (time.perf_counter() - t0) / (rounds * iters)
    print(json.dumps({
        "name": name, "ms": round(t * 1e3, 3),
        "gflops": round(flops_per_iter / 1e9, 1),
        "mfu": round(flops_per_iter / t / PEAK, 3),
    }), flush=True)
    del compiled, out
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="attn")
    ap.add_argument("--w", type=int, default=4, help="windows")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    which = args.which
    W = args.w
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    bf = 2 * W * 16  # CFG-batched frame count

    from latentsync_tpu.ops.attention import dot_product_attention

    if which in ("all", "attn"):
        for s, c, heads in ((1024, 320, 8), (256, 640, 8)):
            d = c // heads
            q = jnp.asarray(rng.standard_normal((bf, s, heads, d)), dt)
            fl = 2 * 2 * bf * heads * s * s * d  # QK^T + PV
            bench_loop(
                f"self_attn_S{s}_C{c} (fused op)",
                lambda y: dot_product_attention(y, y, y).astype(dt), q, fl,
                iters=args.iters,
            )

            def xla_attn(y, d=d):
                logits = jnp.einsum("bqhd,bkhd->bhqk", y, y,
                                    preferred_element_type=jnp.float32)
                w = jax.nn.softmax(logits / np.sqrt(d), axis=-1).astype(y.dtype)
                return jnp.einsum("bhqk,bkhd->bqhd", w, y)

            bench_loop(f"self_attn_S{s}_C{c} (xla einsum)", xla_attn, q, fl,
                       iters=args.iters)

        q = jnp.asarray(rng.standard_normal((2 * W * 1024, 16, 8, 40)), dt)
        fl = 2 * 2 * (2 * W * 1024) * 8 * 16 * 16 * 40
        bench_loop(
            "temporal_attn_S16_C320",
            lambda y: dot_product_attention(y, y, y).astype(dt), q, fl,
            iters=args.iters,
        )

    if which in ("all", "spat"):
        # A/B the three spatial self-attn lowerings at the UNet's shapes
        from latentsync_tpu.ops.attention import oneshot_attention
        from latentsync_tpu.ops.temporal_attention import (
            spatial_attention, temporal_attention,
        )

        for s, c, heads in ((1024, 320, 8), (256, 640, 8)):
            d = c // heads
            q = jnp.asarray(rng.standard_normal((bf, s, c)), dt)
            fl = 2 * 2 * bf * heads * s * s * d
            bench_loop(
                f"spat_lane_sliced_S{s}_C{c}",
                lambda y: spatial_attention(y, y, y, heads).astype(dt), q, fl,
                iters=args.iters,
            )

            def via_oneshot(y, heads=heads, d=d, s=s):
                b = y.shape[0]
                yh = y.reshape(b, s, heads, d)
                yt = jnp.swapaxes(yh, 1, 2).reshape(b * heads, s, d)
                o = oneshot_attention(yt, yt, yt)
                o = jnp.swapaxes(o.reshape(b, heads, s, d), 1, 2)
                return o.reshape(b, s, heads * d)

            bench_loop(f"spat_oneshot_transposed_S{s}_C{c}", via_oneshot, q, fl,
                       iters=args.iters)

            def via_flash(y, heads=heads, d=d, s=s):
                b = y.shape[0]
                yh = y.reshape(b, s, heads, d)
                return dot_product_attention(yh, yh, yh).reshape(b, s, heads * d)

            bench_loop(f"spat_flash_S{s}_C{c}", via_flash, q, fl,
                       iters=args.iters)

        q = jnp.asarray(rng.standard_normal((2 * W * 1024, 16, 320)), dt)
        fl = 2 * 2 * (2 * W * 1024) * 8 * 16 * 16 * 40
        bench_loop(
            "temporal_fused_F16_C320",
            lambda y: temporal_attention(y, y, y, 8).astype(dt), q, fl,
            iters=args.iters,
        )

    if which in ("all", "conv"):
        for hw, c in ((32, 320), (16, 640), (8, 1280)):
            x = jnp.asarray(rng.standard_normal((bf, hw, hw, c)), dt)
            k3 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.002, dt)
            fl = 2 * bf * hw * hw * 9 * c * c

            def conv(y, k=k3):
                return jax.lax.conv_general_dilated(
                    y, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                ).astype(dt)

            bench_loop(f"conv3x3_{hw}x{hw}x{c}", conv, x, fl, iters=args.iters)

    if which in ("all", "gn"):
        import flax.linen as nn

        for hw, c in ((32, 320), (16, 640)):
            xf = jnp.asarray(rng.standard_normal((W * 2, 16, hw, hw, c)), dt)
            m = nn.GroupNorm(32, epsilon=1e-5, dtype=jnp.float32)
            sc = {"params": {"scale": jnp.ones((c,), jnp.float32),
                             "bias": jnp.zeros((c,), jnp.float32)}}
            fl = 10 * xf.size  # elementwise estimate
            bench_loop(
                f"gn_silu_xla_{hw}_{c}",
                lambda y: jax.nn.silu(m.apply(sc, y)).astype(dt), xf, fl,
                iters=args.iters,
            )

    if which in ("all", "spatq"):
        from latentsync_tpu.ops.temporal_attention import spatial_attention

        for s, c, heads in ((1024, 320, 8),):
            d = c // heads
            q = jnp.asarray(rng.standard_normal((bf, s, c)), dt)
            fl = 2 * 2 * bf * heads * s * s * d
            for bq in (128, 256, 512, 1024):
                bench_loop(
                    f"spat_bq{bq}_S{s}",
                    lambda y, bq=bq: spatial_attention(y, y, y, heads,
                                                       block_q=bq).astype(dt),
                    q, fl, iters=args.iters,
                )

    if which in ("all", "tempq"):
        from latentsync_tpu.ops.temporal_attention import temporal_attention

        q = jnp.asarray(rng.standard_normal((2 * W * 1024, 16, 320)), dt)
        fl = 2 * 2 * (2 * W * 1024) * 8 * 16 * 16 * 40
        for blk in (16, 32, 64):
            bench_loop(
                f"temporal_blk{blk}",
                lambda y, blk=blk: temporal_attention(y, y, y, 8,
                                                      block=blk).astype(dt),
                q, fl, iters=args.iters,
            )

    if which in ("all", "gn2"):
        # XLA GroupNorm+SiLU vs the streaming Pallas kernel at the
        # UNet's cross-frame shape (rows = F·H·W per sample)
        import flax.linen as nn

        from latentsync_tpu.ops.groupnorm import group_norm_silu_streaming

        for hw, c in ((32, 320), (16, 640), (8, 1280)):
            rows = 16 * hw * hw
            xf = jnp.asarray(rng.standard_normal((2 * W * rows, c)), dt)
            sc = jnp.ones((c,), jnp.float32)
            bi = jnp.zeros((c,), jnp.float32)
            fl = 10 * xf.size
            m = nn.GroupNorm(32, epsilon=1e-5, dtype=jnp.float32)
            mp = {"params": {"scale": sc, "bias": bi}}
            bench_loop(
                f"gn_xla_crossframe_{hw}_{c}",
                lambda y, rows=rows, c=c: jax.nn.silu(
                    m.apply(mp, y.reshape(-1, rows, c))
                ).astype(dt).reshape(-1, c),
                xf, fl, iters=args.iters,
            )
            bench_loop(
                f"gn_pallas_stream_{hw}_{c}",
                lambda y, rows=rows: group_norm_silu_streaming(
                    y, sc, bi, 32, rows, block_rows=min(rows, 2048)
                ).astype(dt),
                xf, fl, iters=args.iters,
            )

    if which in ("all", "gn3"):
        # per-frame GN (transformer norms): XLA vs the single-block kernel
        import flax.linen as nn

        from latentsync_tpu.ops.groupnorm import group_norm_silu

        for hw, c in ((32, 320), (16, 640), (8, 1280)):
            rows = hw * hw
            xf = jnp.asarray(rng.standard_normal((bf * rows, c)), dt)
            sc = jnp.ones((c,), jnp.float32)
            bi = jnp.zeros((c,), jnp.float32)
            fl = 10 * xf.size
            m = nn.GroupNorm(32, epsilon=1e-6, dtype=jnp.float32)
            mp = {"params": {"scale": sc, "bias": bi}}
            bench_loop(
                f"gnpf_xla_{hw}_{c}",
                lambda y, rows=rows, c=c: m.apply(
                    mp, y.reshape(-1, rows, c)
                ).astype(dt).reshape(-1, c),
                xf, fl, iters=args.iters,
            )
            bench_loop(
                f"gnpf_pallas_{hw}_{c}",
                lambda y, rows=rows: group_norm_silu(
                    y, sc, bi, 32, rows, eps=1e-6, silu=False
                ).astype(dt),
                xf, fl, iters=args.iters,
            )

    if which in ("all", "int8"):
        # Is int8 MXU throughput real on this part, and does it survive
        # the dynamic-quantization overhead? (v5e peak: 394 int8 TOPS vs
        # 197 bf16 TFLOPS.) Shapes = the three FLOP-carrying families.
        def q_rowwise(x):
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
            s = 127.0 / jnp.maximum(amax, 1e-6)
            return jnp.clip(jnp.round(x.astype(jnp.float32) * s), -127, 127).astype(jnp.int8), s

        def fit(out, cin):
            """Chained bench steps must return the input's shape."""
            cout = out.shape[-1]
            if cout >= cin:
                return out[:, :cin]
            return jnp.tile(out, (1, cin // cout + 1))[:, :cin]

        # (rows, cin, cout): FF in/out + qkv proj at res 32/16
        mm_shapes = (
            (bf * 1024, 320, 2560), (bf * 1024, 1280, 320),
            (bf * 256, 640, 5120), (bf * 1024, 320, 320),
        )
        for rows, cin, cout in mm_shapes:
            x = jnp.asarray(rng.standard_normal((rows, cin)), dt)
            w = jnp.asarray(rng.standard_normal((cin, cout)) * 0.02, dt)
            wq, wsc = q_rowwise(w.T)  # per-output-channel scales
            wq = wq.T
            wsc = (1.0 / wsc.T).astype(jnp.float32)  # (1, cout) dequant mult
            fl = 2 * rows * cin * cout

            def mm_bf16(y, w=w, cin=cin):
                return fit(jax.lax.dot_general(
                    y, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt), cin)

            bench_loop(f"mm_bf16_{rows}x{cin}x{cout}", mm_bf16, x, fl,
                       iters=args.iters)

            def mm_int8_static(y, wq=wq, wsc=wsc, cin=cin):
                # pre-quantized activations: pure int8 MXU speed
                yq = y.astype(jnp.int8)
                acc = jax.lax.dot_general(
                    yq, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return fit((acc.astype(jnp.float32) * wsc).astype(dt), cin)

            bench_loop(f"mm_int8_static_{rows}x{cin}x{cout}", mm_int8_static,
                       x, fl, iters=args.iters)

            def mm_int8_dyn(y, wq=wq, wsc=wsc, cin=cin):
                # full dynamic path: rowwise act quant + int8 MXU + dequant
                yq, ysc = q_rowwise(y)
                acc = jax.lax.dot_general(
                    yq, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = acc.astype(jnp.float32) * (wsc / ysc)
                return fit(out.astype(dt), cin)

            bench_loop(f"mm_int8_dyn_{rows}x{cin}x{cout}", mm_int8_dyn,
                       x, fl, iters=args.iters)

        # conv3×3 int8 — direct lax conv with int8 operands
        for hw, c in ((32, 320), (16, 640), (8, 1280)):
            x = jnp.asarray(rng.standard_normal((bf, hw, hw, c)), dt)
            k3 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, dt)
            kq = jnp.clip(jnp.round(k3 * 50), -127, 127).astype(jnp.int8)
            fl = 2 * bf * hw * hw * 9 * c * c

            def conv_bf16(y, k=k3):
                return jax.lax.conv_general_dilated(
                    y, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(dt)

            bench_loop(f"conv3x3_bf16_{hw}_{c}", conv_bf16, x, fl,
                       iters=args.iters)

            def conv_int8(y, k=kq):
                yq = y.astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    yq, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * 2e-4).astype(dt)

            try:
                bench_loop(f"conv3x3_int8_{hw}_{c}", conv_int8, x, fl,
                           iters=args.iters)
            except Exception as e:  # int8 conv may not lower on TPU
                print(json.dumps({"name": f"conv3x3_int8_{hw}_{c}",
                                  "error": str(e)[:200]}), flush=True)

            def conv_int8_dyn(y, k=kq):
                amax = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=(1, 2, 3),
                               keepdims=True)
                s = 127.0 / jnp.maximum(amax, 1e-6)
                yq = jnp.clip(jnp.round(y.astype(jnp.float32) * s),
                              -127, 127).astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    yq, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * (2e-4 / s)).astype(dt)

            try:
                bench_loop(f"conv3x3_int8_dyn_{hw}_{c}", conv_int8_dyn, x, fl,
                           iters=args.iters)
            except Exception as e:
                print(json.dumps({"name": f"conv3x3_int8_dyn_{hw}_{c}",
                                  "error": str(e)[:200]}), flush=True)

    if which in ("all", "ffn"):
        # r4: fused GEGLU FF (up+gate+down, hidden resident in VMEM) vs
        # the XLA pair, and the 3-output fused q/k/v projection vs three
        # XLA matmuls — at the UNet's per-resolution shapes for this W.
        from latentsync_tpu.ops.ffn import _geglu_xla, geglu_ffn, qkv_proj

        for s_hw, c in ((1024, 320), (256, 640), (64, 1280)):
            m = bf * s_hw
            inner = 4 * c
            x = jnp.asarray(rng.standard_normal((m, c)), dt)
            w_up = jnp.asarray(rng.standard_normal((c, 2 * inner)) * 0.02, dt)
            b_up = jnp.zeros((2 * inner,), jnp.float32)
            w_dn = jnp.asarray(rng.standard_normal((inner, c)) * 0.02, dt)
            b_dn = jnp.zeros((c,), jnp.float32)
            fl = 2 * m * c * 2 * inner + 2 * m * inner * c  # up pair + down

            def ff_xla(y, w_up=w_up, b_up=b_up, w_dn=w_dn, b_dn=b_dn,
                       inner=inner):
                return _geglu_xla(y, w_up[:, :inner], w_up[:, inner:],
                                  b_up[:inner], b_up[inner:], w_dn,
                                  b_dn).astype(dt)

            bench_loop(f"geglu_xla_M{m}_C{c}", ff_xla, x, fl,
                       iters=args.iters)

            def ff_fused(y, w_up=w_up, b_up=b_up, w_dn=w_dn, b_dn=b_dn):
                return geglu_ffn(y, w_up, b_up, w_dn, b_dn).astype(dt)

            try:
                bench_loop(f"geglu_fused_M{m}_C{c}", ff_fused, x, fl,
                           iters=args.iters)
            except Exception as e:
                print(json.dumps({"name": f"geglu_fused_M{m}_C{c}",
                                  "error": str(e)[:300]}), flush=True)

            wq = jnp.asarray(rng.standard_normal((c, c)) * 0.02, dt)
            wk = jnp.asarray(rng.standard_normal((c, c)) * 0.02, dt)
            wv = jnp.asarray(rng.standard_normal((c, c)) * 0.02, dt)
            fl3 = 3 * 2 * m * c * c

            def qkv_xla3(y, wq=wq, wk=wk, wv=wv):
                return (y @ wq + y @ wk + y @ wv).astype(dt)

            bench_loop(f"qkv_xla_M{m}_C{c}", qkv_xla3, x, fl3,
                       iters=args.iters)

            def qkv_fused(y, wq=wq, wk=wk, wv=wv):
                q, k, v = qkv_proj(y, wq, wk, wv)
                return (q + k + v).astype(dt)

            try:
                bench_loop(f"qkv_fused_M{m}_C{c}", qkv_fused, x, fl3,
                           iters=args.iters)
            except Exception as e:
                print(json.dumps({"name": f"qkv_fused_M{m}_C{c}",
                                  "error": str(e)[:300]}), flush=True)

    if which in ("all", "ffn8"):
        # r4: int8-STORED-activation GEGLU prototype (VERDICT r3 #1c) —
        # x arrives int8+rowwise scale and leaves int8+rowwise scale, so
        # the op's HBM activation traffic halves vs the bf16 fused
        # kernel. Chained (out feeds next iter), like activations
        # flowing between ops would.
        from latentsync_tpu.ops.ffn import (
            geglu_ffn,
            geglu_ffn_int8io,
            quantize_rowwise,
        )

        for s_hw, c in ((1024, 320), (256, 640)):
            m = bf * s_hw
            inner = 4 * c
            x = jnp.asarray(rng.standard_normal((m, c)), dt)
            w_up = jnp.asarray(rng.standard_normal((c, 2 * inner)) * 0.02, dt)
            b_up = jnp.zeros((2 * inner,), jnp.float32)
            w_dn = jnp.asarray(rng.standard_normal((inner, c)) * 0.02, dt)
            b_dn = jnp.zeros((c,), jnp.float32)
            fl = 2 * m * c * 2 * inner + 2 * m * inner * c

            def ff_bf16(y, w_up=w_up, b_up=b_up, w_dn=w_dn, b_dn=b_dn):
                return geglu_ffn(y, w_up, b_up, w_dn, b_dn).astype(dt)

            bench_loop(f"geglu_bf16io_M{m}_C{c}", ff_bf16, x, fl,
                       iters=args.iters)

            def ff_i8(carry, w_up=w_up, b_up=b_up, w_dn=w_dn, b_dn=b_dn):
                xi, xs = carry
                return geglu_ffn_int8io(xi, xs, w_up, b_up, w_dn, b_dn)

            try:
                bench_loop(f"geglu_int8io_M{m}_C{c}", ff_i8,
                           tuple(quantize_rowwise(x)), fl,
                           iters=args.iters)
            except Exception as e:
                print(json.dumps({"name": f"geglu_int8io_M{m}_C{c}",
                                  "error": str(e)[:300]}), flush=True)

    if which in ("all", "qmm"):
        # the fused Pallas int8 matmul (ops/qmm): does keeping the
        # activation quantize + int32 dequant in VMEM recover the MXU
        # double-rate the XLA dense path loses (int8 probe above)?
        from latentsync_tpu.ops.qmm import quantized_matmul_pallas

        def fit(out, cin):
            cout = out.shape[-1]
            if cout >= cin:
                return out[:, :cin]
            return jnp.tile(out, (1, cin // cout + 1))[:, :cin]

        mm_shapes = (
            (bf * 1024, 320, 2560), (bf * 1024, 1280, 320),
            (bf * 256, 640, 5120), (bf * 1024, 320, 320),
        )
        for rows, cin, cout in mm_shapes:
            x = jnp.asarray(rng.standard_normal((rows, cin)), dt)
            w = jnp.asarray(rng.standard_normal((cin, cout)) * 0.02,
                            jnp.float32)
            fl = 2 * rows * cin * cout

            def mm_bf16(y, w=w.astype(dt), cin=cin):
                return fit(jax.lax.dot_general(
                    y, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt), cin)

            bench_loop(f"qmm_bf16_{rows}x{cin}x{cout}", mm_bf16, x, fl,
                       iters=args.iters)

            def mm_pallas(y, w=w, cin=cin):
                return fit(quantized_matmul_pallas(y, w).astype(dt), cin)

            try:
                bench_loop(f"qmm_pallas_{rows}x{cin}x{cout}", mm_pallas,
                           x, fl, iters=args.iters)
            except Exception as e:
                print(json.dumps({"name": f"qmm_pallas_{rows}x{cin}x{cout}",
                                  "error": str(e)[:200]}), flush=True)

    if which in ("all", "unet", "ablate"):
        import dataclasses

        from latentsync_tpu.config import LatentSyncConfig
        from latentsync_tpu.models.unet3d import UNet3DConditionModel
        from latentsync_tpu.utils.params import UNET_ZERO_PATHS, cast_floating, fast_init

        cfg = LatentSyncConfig()
        variants = [("full", cfg.unet)]
        if which == "ablate":
            variants += [
                ("no_temporal", dataclasses.replace(cfg.unet, use_motion_module=False)),
                ("no_audio", dataclasses.replace(cfg.unet, add_audio_layer=False)),
                ("resnets_only", dataclasses.replace(
                    cfg.unet,
                    use_motion_module=False,
                    add_audio_layer=False,
                    down_block_types=("DownBlock3D",) * 4,
                    up_block_types=("UpBlock3D",) * 4,
                )),
            ]
        b = 2 * W
        for name, ucfg in variants:
            unet = UNet3DConditionModel(ucfg, dtype=dt)
            params = cast_floating(
                fast_init(
                    lambda s, t, a, u=unet: u.init(jax.random.PRNGKey(0), s, t, a),
                    jnp.zeros((1, 16, 32, 32, 13)),
                    jnp.zeros((1,), jnp.int32),
                    jnp.zeros((1, 16, 50, 384)),
                    zero_paths=UNET_ZERO_PATHS,
                ),
                dt,
            )
            audio = jnp.asarray(rng.standard_normal((b, 16, 50, 384)), dt)
            tvec = jnp.full((b,), 500, jnp.int32)
            sample = jnp.asarray(rng.standard_normal((b, 16, 32, 32, 13)), dt)

            # measure FLOPs of a single forward from XLA (no loop)
            single = jax.jit(
                lambda p, s: unet.apply(p, s, tvec, audio)
            ).lower(params, sample).compile()
            cost = single.cost_analysis()
            fl = float(cost.get("flops", 0.0)) if cost else 0.0
            del single

            def step(y, p, u=unet, a=audio, tv=tvec):
                eps = u.apply(p, y, tv, a)
                return jnp.concatenate([eps.astype(dt), y[..., 4:]], axis=-1)

            t = bench_loop(f"unet_fwd_{name}_b{b}", step, sample, fl, iters=5,
                           const_args=(params,))
            if name == "full":
                print(json.dumps({
                    "name": "denoise_estimate",
                    "fps_at_20steps": round(W * 16 / (t * 20), 2),
                }), flush=True)
            del params

    if which in ("all", "tmod"):
        # Standalone TemporalModule per UNet level (r5: the ablation puts
        # the temporal family at 49.7 ms/step = 38% of the exact forward
        # at ~11% MFU — find where inside the module it goes). Counts at
        # the release config: 5 modules at res 32/c320, 5 at 16/640,
        # 5 at 8/1280, 6 at 4/1280 (2·layers down + mid + 3·layers up).
        from latentsync_tpu.config import LatentSyncConfig
        from latentsync_tpu.models.unet3d import TemporalModule
        from latentsync_tpu.utils.params import cast_floating, fast_init

        mm = LatentSyncConfig().unet.motion_module
        b = 2 * W  # CFG-batched videos
        for s_res, c, n_mod in ((32, 320, 5), (16, 640, 5),
                                (8, 1280, 5), (4, 1280, 6)):
            mod = TemporalModule(c, mm, 32, dtype=dt)
            x0 = jnp.asarray(
                rng.standard_normal((b, 16, s_res, s_res, c)), dt)
            params = cast_floating(
                fast_init(lambda y, m=mod: m.init(jax.random.PRNGKey(0), y),
                          x0), dt)
            single = jax.jit(
                lambda p, y, m=mod: m.apply(p, y)
            ).lower(params, x0).compile()
            cost = single.cost_analysis()
            fl = float(cost.get("flops", 0.0)) if cost else 0.0
            del single

            def step(y, p, m=mod):
                return m.apply(p, y)

            t = bench_loop(f"tmod_res{s_res}_c{c}", step, x0, fl, iters=5,
                           const_args=(params,))
            print(json.dumps({"name": f"tmod_res{s_res}_c{c}_family",
                              "n_modules": n_mod,
                              "family_ms": round(t * 1e3 * n_mod, 2)}),
                  flush=True)
            del params

    if which in ("all", "dcread"):
        # DeepCache read-step cost: full forward vs plain shallow slice
        # vs encoder-propagation slice (docs/perf_audit.md r03 FLOP cuts)
        from latentsync_tpu.config import LatentSyncConfig
        from latentsync_tpu.models.unet3d import UNet3DConditionModel
        from latentsync_tpu.utils.params import UNET_ZERO_PATHS, cast_floating, fast_init

        ucfg = LatentSyncConfig().unet
        unet = UNet3DConditionModel(ucfg, dtype=dt)
        params = cast_floating(
            fast_init(
                lambda s, t, a: unet.init(jax.random.PRNGKey(0), s, t, a),
                jnp.zeros((1, 16, 32, 32, 13)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 16, 50, 384)),
                zero_paths=UNET_ZERO_PATHS,
            ),
            dt,
        )
        b = 2 * W
        audio = jnp.asarray(rng.standard_normal((b, 16, 50, 384)), dt)
        tvec = jnp.full((b,), 500, jnp.int32)
        sample = jnp.asarray(rng.standard_normal((b, 16, 32, 32, 13)), dt)
        import jax.lax as lax

        for name, kw in (
            ("full", {}),
            ("read_plain", dict(cache_depth=1, cache_read=True)),
            ("read_enc", dict(cache_depth=1, cache_read=True,
                              cache_encoder=True)),
        ):
            cache = ()
            if kw:
                _, cache = jax.jit(
                    lambda p, s: unet.apply(
                        p, s, tvec, audio, cache_depth=1, cache_read=False,
                        cache_encoder=kw.get("cache_encoder", False))
                )(params, sample)

            # cache rides as an ARGUMENT — closing over it would bake
            # GBs of constants into the lowered HLO (and choke the
            # remote-compile transport). The enc-read output depends
            # only on (cache, t), so a chained fori_loop would be
            # LOOP-INVARIANT and XLA hoists the whole body out — the
            # first version of this probe reported 13.5 ms for an empty
            # loop. Defeat it: make the cache depend on the iterate via
            # a free zero-cost mix-in, keeping every iteration live.
            @jax.jit
            def run(p, c, y, kw=kw):
                def one(i, yy):
                    if kw:
                        zero = (yy.ravel()[0] * 0).astype(dt)
                        cc = jax.tree.map(lambda a: a + zero, c)
                        eps, _ = unet.apply(p, yy, tvec, audio,
                                            deep_cache=cc, **kw)
                    else:
                        eps = unet.apply(p, yy, tvec, audio)
                    return jnp.concatenate(
                        [eps.astype(dt), yy[..., 4:]], axis=-1)
                return lax.fori_loop(0, 5, one, y)

            out = run(params, cache, sample)
            fetch_sync(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(params, cache, out)
            fetch_sync(out)
            t = (time.perf_counter() - t0) / 15
            print(json.dumps({"name": f"unet_{name}_b{b}",
                              "ms": round(t * 1e3, 3)}), flush=True)

    if which in ("all", "denoise"):
        # the full 20-step denoise program at the env knobs, standalone —
        # localizes loop overhead vs the per-step sum (dcread + VAE
        # probes): total bench time minus this is VAE+bench glue
        from latentsync_tpu.audio.features import Audio2Feature
        from latentsync_tpu.config import LatentSyncConfig, WhisperConfig
        from latentsync_tpu.models.unet3d import UNet3DConditionModel
        from latentsync_tpu.models.vae import AutoencoderKL
        from latentsync_tpu.pipelines.lipsync import LipsyncPipeline
        from latentsync_tpu.utils.params import UNET_ZERO_PATHS, cast_floating, fast_init

        cfg = LatentSyncConfig()
        lat = cfg.data.resolution // cfg.vae.scale_factor
        f = cfg.data.num_frames
        unet = UNet3DConditionModel(cfg.unet, dtype=dt)
        up = cast_floating(
            fast_init(
                lambda s, t, a: unet.init(jax.random.PRNGKey(0), s, t, a),
                jnp.zeros((1, f, lat, lat, cfg.unet.in_channels)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, f, 50, cfg.unet.cross_attention_dim)),
                zero_paths=UNET_ZERO_PATHS,
            ), dt)
        vae = AutoencoderKL(cfg.vae, dtype=dt)
        vp = cast_floating(
            fast_init(
                lambda x: vae.init(jax.random.PRNGKey(0), x,
                                   jax.random.PRNGKey(1)),
                jnp.zeros((1, cfg.data.resolution, cfg.data.resolution, 3)),
                seed=1), dt)
        pipe = LipsyncPipeline(up, vp, Audio2Feature(WhisperConfig.tiny()),
                               cfg, dtype=dt)
        wW = W // 2 if W >= 2 else 1  # probe W means windows here
        lat0 = jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(0), (1, 1, lat, lat, 4)),
            (wW, f, lat, lat, 4))
        mask = jnp.ones((wW, f, lat, lat, 1), jnp.float32)
        masked = jnp.asarray(rng.standard_normal((wW, f, lat, lat, 4)),
                             jnp.float32)
        ref = jnp.asarray(rng.standard_normal((wW, f, lat, lat, 4)),
                          jnp.float32)
        audio = jnp.asarray(rng.standard_normal((wW, f, 50, 384)), jnp.float32)
        den = pipe._denoise_fn(20, 1.5, True)
        out = den(pipe.unet_params, lat0, mask, masked, ref, audio)
        fetch_sync(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = den(pipe.unet_params, lat0, mask, masked, ref, audio)
            fetch_sync(out)
        t = (time.perf_counter() - t0) / 3
        print(json.dumps({
            "name": f"denoise20_W{wW}",
            "knobs": [os.environ.get("LATENTSYNC_DEEPCACHE", ""),
                      os.environ.get("LATENTSYNC_CFG_INTERVAL", "")],
            "ms": round(t * 1e3, 3),
        }), flush=True)

    if which in ("all", "vae"):
        # VAE encode/decode stage cost at the serving chunk shapes —
        # as denoise shrinks under the FLOP-cut knobs, this stage's
        # share of the device path grows (docs/perf_audit.md r03).
        from latentsync_tpu.config import LatentSyncConfig
        from latentsync_tpu.models.vae import AutoencoderKL
        from latentsync_tpu.utils.params import cast_floating, fast_init

        vcfg = LatentSyncConfig().vae
        vae = AutoencoderKL(vcfg, dtype=dt)
        vparams = cast_floating(
            fast_init(
                lambda x: vae.init(jax.random.PRNGKey(0), x,
                                   jax.random.PRNGKey(1)),
                jnp.zeros((1, 256, 256, 3)), seed=1,
            ),
            dt,
        )
        for n in (32, 64):
            pix = jnp.asarray(rng.standard_normal((n, 256, 256, 3)), dt) * 0.3
            lat = jnp.asarray(rng.standard_normal((n, 32, 32, 4)), dt)
            for name, fn, x in (
                ("vae_encode", lambda p, y: vae.apply(p, y, method="encode"), pix),
                ("vae_decode", lambda p, y: vae.apply(p, y, method="decode"), lat),
            ):
                c = jax.jit(fn).lower(vparams, x).compile()
                cost = c.cost_analysis()
                fl = float(cost.get("flops", 0.0)) if cost else 0.0
                fetch_sync(c(vparams, x))
                t0 = time.perf_counter()
                rounds = 5
                out = None
                for _ in range(rounds):
                    out = c(vparams, x)
                fetch_sync(out)
                t = (time.perf_counter() - t0) / rounds
                print(json.dumps({
                    "name": f"{name}_n{n}", "ms": round(t * 1e3, 3),
                    "gflops": round(fl / 1e9, 1),
                    "mfu": round(fl / t / PEAK, 3),
                }), flush=True)
                del c


if __name__ == "__main__":
    main()
