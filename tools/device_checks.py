"""On-TPU kernel semantics checks -> DEVICE_CHECKS.json (repo root).

The CPU interpreter ignores the Pallas in-kernel PRNG seed
(ops/flash_attention.py: interpreter caveat), so the dropout-bearing
invariants below are verifiable ONLY on the device. This script promotes
the round-3 scratch probes (_mkcheck.py, _decoupled.py) into one
repeatable artifact, run in the bench environment each round:

  1. decoupled_fwd_parity   — block_kv_fwd=T forward == coupled forward
  2. decoupled_dropout_fd   — finite-difference grad check THROUGH dropout
                              at decoupled fwd/bwd block sizes (canonical
                              min-width strip draws must align or the
                              analytic grad is garbage)
  3. fused_single_kv_parity — fused single-kv backward == split pair
  4. fused_multi_kv_parity  — fused multi-kv backward == split pair
                              (T=2048/4096, dropout 0 and 0.1)
  5. chunked_kv_dropout_fd  — T past the 64 MB VMEM gate (kv-CHUNKED fused
                              calls): FD grad through dropout validates the
                              per-chunk kv-offset dropout numbering
  6. skip_noskip_identity   — segment-skip pruning is bit-identical to the
                              dense pass
  7. int8_cosine            — serving int8 attention cosine vs bf16

Each check appends {name, pass, metrics...}; exit code 1 if any fails.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "DEVICE_CHECKS.json")


def _flush(partial):
    """Write the artifact after EVERY check: a relay hang mid-run (plus the
    queue's external timeout kill) must not lose the checks already done."""
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "ok": all(r["pass"] for r in RESULTS) and not partial,
        "partial": partial,
        "checks": RESULTS,
    }
    with open(ARTIFACT, "w") as f:
        json.dump(out, f, indent=2)
    return out


def _py(v):
    """JSON-safe scalar: numpy float32/int64 etc. crash json.dump."""
    if isinstance(v, (float, np.floating)):
        return round(float(v), 6)
    if isinstance(v, (int, np.integer)):
        return int(v)
    return v


def record(name, ok, **metrics):
    RESULTS.append({"name": name, "pass": bool(ok),
                    **{k: _py(v) for k, v in metrics.items()}})
    print(f"{'PASS' if ok else 'FAIL'} {name} {metrics}", flush=True)
    _flush(partial=True)


def guarded(name, fn):
    """One crashing check (compile failure, relay drop) must not lose the
    artifact: record it as a failure and keep going."""
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — artifact robustness
        record(name, False, error=repr(e)[:400])


def main():
    import jax
    import jax.numpy as jnp
    import omnibiote_tpu as obt
    from omnibiote_tpu.ops import flash_attention as fa
    from omnibiote_tpu.models.rope import rope_tables
    from omnibiote_tpu.ops.segments import segment_ids_np

    rng = np.random.default_rng(0)
    scale = 8.0 / 1024
    H, D = 8, 128
    key = jax.random.key(3, impl="rbg")

    def segs_randeos(B, T, n_eos, seed=0):
        r = np.random.default_rng(seed)
        toks = r.integers(20, 65000, size=(B, T)).astype(np.int32)
        for row in range(B):
            toks[row, r.integers(32, T, size=n_eos)] = obt.EOS_TOKEN
        return jnp.asarray(segment_ids_np(toks))

    # ---- 1. decoupled fwd parity (dropout 0, bf16) -----------------------
    def check_decoupled_fwd():
        B, T = 2, 2048
        segs = segs_randeos(B, T, 5)
        rope = rope_tables(D, T, 10000.0)
        qb = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)

        def fwd(bkvf):
            return fa.flash_attention(qb, qb, qb, segment_ids=segs,
                                      scale=scale, block_q=512, block_kv=512,
                                      rope=rope, block_kv_fwd=bkvf)

        a = np.asarray(jax.jit(lambda: fwd(None))()).astype(np.float32)
        b = np.asarray(jax.jit(lambda: fwd(T))()).astype(np.float32)
        rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
        record("decoupled_fwd_parity", rel < 2e-2, rel_err=rel, T=T)

    guarded("decoupled_fwd_parity", check_decoupled_fwd)

    # ---- 2. FD grad through dropout at decoupled blocks (fp32) -----------
    def fd_check(name, attn_kwargs, T, B=2, n_probes=3, seed=1):
        segs = segs_randeos(B, T, 5, seed=seed)
        ropeT = rope_tables(D, T, 10000.0)
        qf = jnp.asarray(np.random.default_rng(seed)
                         .standard_normal((B, T, H, D)) * 0.5, jnp.float32)

        def loss(x):
            o = fa.flash_attention(x, x, x, segment_ids=segs, scale=scale,
                                   rope=ropeT, dropout_rng=key,
                                   **attn_kwargs)
            return jnp.sum(o * o)

        lossj = jax.jit(loss)
        g = np.asarray(jax.jit(jax.grad(loss))(qf))
        eps = 1e-2
        r = np.random.default_rng(seed + 7)
        worst = 0.0
        ok_all = True
        for _ in range(n_probes):
            i = (int(r.integers(B)), int(r.integers(T)), int(r.integers(H)),
                 int(r.integers(D)))
            d = np.zeros(qf.shape, np.float32)
            d[i] = eps
            fd = (float(lossj(qf + jnp.asarray(d)))
                  - float(lossj(qf - jnp.asarray(d)))) / (2 * eps)
            err = abs(g[i] - fd) / max(abs(fd), 1.0)
            worst = max(worst, err)
            ok_all = ok_all and err <= 4e-2
        record(name, ok_all, worst_rel_err=worst, T=T)

    guarded("decoupled_dropout_fd", lambda: fd_check(
        "decoupled_dropout_fd",
        dict(block_q=512, block_kv=512, block_kv_fwd=2048,
             dropout_rate=0.2), T=2048))

    # ---- 3/4. fused backward parity vs split (single- and multi-kv) ------
    def grad_fn(T, segs, ropeT, bq, bkv, drop):
        def f(x, kk):
            return jnp.sum(fa.flash_attention(
                x, x, x, segment_ids=segs, scale=scale, block_q=bq,
                block_kv=bkv, rope=ropeT, dropout_rate=drop,
                dropout_rng=kk).astype(jnp.float32))
        return jax.jit(jax.grad(f))

    def fused_parity(label, T, B, bq, bkv, flag):
        segsT = segs_randeos(B, T, 5, seed=2)
        ropeT = rope_tables(D, T, 10000.0)
        q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
        worst = 0.0
        ok_all = True
        try:
            for drop in (0.0, 0.1):
                setattr(fa, flag, True)
                g_f = np.asarray(
                    grad_fn(T, segsT, ropeT, bq, bkv, drop)(q, key)
                ).astype(np.float32)
                setattr(fa, flag, False)
                g_s = np.asarray(
                    grad_fn(T, segsT, ropeT, bq, bkv, drop)(q, key)
                ).astype(np.float32)
                rel = float(np.abs(g_f - g_s).max()
                            / (np.abs(g_s).max() + 1e-9))
                # dropout 0: the fused path must be BIT-identical to split
                ok = (rel == 0.0) if drop == 0.0 else (rel < 2e-2)
                worst = max(worst, rel)
                ok_all = ok_all and ok
        finally:
            setattr(fa, flag, True)
        record(label, ok_all, worst_rel_err=worst, T=T)

    for label, T, B, bq, bkv, flag in [
            ("fused_single_kv_parity", 1024, 4, 512, 1024,
             "FUSED_SINGLE_KV_BWD"),
            ("fused_multi_kv_parity_2048", 2048, 4, 512, 512,
             "FUSED_MULTIKV_BWD"),
            ("fused_multi_kv_parity_4096", 4096, 2, 512, 512,
             "FUSED_MULTIKV_BWD")]:
        guarded(label, lambda a=label, b=T, c=B, d=bq, e=bkv, f=flag:
                fused_parity(a, b, c, d, e, f))

    # ---- 5. chunked-kv dropout numbering (T past the VMEM gate) ----------
    # Tk*H*D*12B = 8192*8*128*12 = 100 MB > 64 MB gate -> kv-chunked path
    guarded("chunked_kv_dropout_fd", lambda: fd_check(
        "chunked_kv_dropout_fd",
        dict(block_q=512, block_kv=512, dropout_rate=0.2),
        T=8192, B=1, n_probes=3, seed=3))

    # ---- 6. segment-skip == no-skip bit identity --------------------------
    def check_skip_identity():
        B, T = 4, 2048
        segs = segs_randeos(B, T, 8, seed=4)
        ropeT = rope_tables(D, T, 10000.0)
        q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)

        def fwd_skip(skip):
            return fa.flash_attention(q, q, q, segment_ids=segs, scale=scale,
                                      block_q=512, block_kv=512, rope=ropeT,
                                      segment_skip=skip)

        a = np.asarray(jax.jit(lambda: fwd_skip(True))())
        b = np.asarray(jax.jit(lambda: fwd_skip(False))())
        identical = bool((a == b).all())
        record("skip_noskip_identity", identical, bit_identical=identical,
               T=T)

    guarded("skip_noskip_identity", check_skip_identity)

    # ---- 7. int8 serving attention cosine vs bf16 -------------------------
    def check_int8_cosine():
        from omnibiote_tpu.ops.int8_attention import int8_flash_attention
        B, T = 2, 1024
        segs = segs_randeos(B, T, 3, seed=5)
        ropeT = rope_tables(D, T, 10000.0)
        q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
        o8 = np.asarray(jax.jit(lambda: int8_flash_attention(
            q, q, q, scale=scale, segment_ids=segs, rope=ropeT))()
            ).astype(np.float32).ravel()
        ob = np.asarray(jax.jit(lambda: fa.flash_attention(
            q, q, q, segment_ids=segs, scale=scale, block_q=512,
            block_kv=1024, rope=ropeT))()).astype(np.float32).ravel()
        cos = float(np.dot(o8, ob) / (np.linalg.norm(o8) * np.linalg.norm(ob)
                                      + 1e-9))
        record("int8_cosine", cos >= 0.999, cosine=cos, T=T)

    guarded("int8_cosine", check_int8_cosine)

    out = _flush(partial=False)
    out["device"] = str(jax.devices()[0].device_kind)
    with open(ARTIFACT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"ok": out["ok"], "n": len(RESULTS)}))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
