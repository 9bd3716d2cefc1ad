"""Pod-plan calculator: memory/collective/roofline math sanity."""
import jax
import numpy as np

from omnibiote_tpu.config import OmniBioTAConfig


def _cfg_big():
    return OmniBioTAConfig(n_layer=16, n_embd=2048, n_head=16,
                           vocab_size=2 ** 16, block_size=2048)


def test_count_params_matches_real_init():
    from tools.pod_plan import count_params
    from omnibiote_tpu.models.omnibiota import init_params, num_params

    cfg = OmniBioTAConfig(n_layer=2, n_head=2, n_embd=64, vocab_size=256,
                          block_size=64)
    p = count_params(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert p["total"] == num_params(params, non_embedding=False)
    assert p["non_embedding"] == num_params(params, non_embedding=True)


def test_single_chip_1b_recipe_matches_design():
    """The 1.07B single-chip recipe (DESIGN 4c): fp32 everything does not
    fit 16 GB; bf16 moments+grads + remat at accum 1 does."""
    from tools.pod_plan import plan

    cfg = _cfg_big()
    fp32 = plan(cfg, chips=1, sharding="replicated", mesh=None, mini=8,
                accum=1, ctx=1024)
    assert not fp32["memory_bytes"]["fits"]
    # master alone ~4.3 GB (DESIGN 4c)
    np.testing.assert_allclose(fp32["memory_bytes"]["master_fp32"],
                               4.295e9, rtol=0.01)

    lean = plan(cfg, chips=1, sharding="replicated", mesh=None, mini=8,
                accum=1, ctx=1024, moment_dtype="bfloat16",
                grad_dtype="bfloat16", remat=1)
    assert lean["memory_bytes"]["fits"]
    assert (lean["memory_bytes"]["adam_moments"]
            == fp32["memory_bytes"]["adam_moments"] / 2)
    # remat shrinks activations
    assert (lean["memory_bytes"]["activations"]
            < fp32["memory_bytes"]["activations"])


def test_fsdp_divides_state_and_adds_collectives():
    from tools.pod_plan import plan

    cfg = _cfg_big()
    one = plan(cfg, chips=1, sharding="replicated", mesh=None, mini=8,
               accum=16, ctx=2048)
    eight = plan(cfg, chips=8, sharding="fsdp", mesh=None, mini=8,
                 accum=16, ctx=2048)
    m1, m8 = one["memory_bytes"], eight["memory_bytes"]
    np.testing.assert_allclose(m8["master_fp32"], m1["master_fp32"] / 8,
                               rtol=1e-6)
    np.testing.assert_allclose(m8["adam_moments"], m1["adam_moments"] / 8,
                               rtol=1e-6)
    assert "fsdp_param_allgather" in eight["collectives_bytes"]
    assert eight["times_s"]["ici"] > 0
    # 8 chips process 8x the tokens per step (same mini) in ~the same
    # compute time
    assert (eight["flops"]["tokens_per_step"]
            == 8 * one["flops"]["tokens_per_step"])


def test_pp_bubble_and_fsdp_pp_memory():
    from tools.pod_plan import plan

    cfg = _cfg_big()
    pp = plan(cfg, chips=8, sharding="pp", mesh=(1, 8), mini=4, accum=8,
              ctx=2048)
    assert pp["flops"]["bubble"] == (8 - 1) / (8 + 8 - 1)
    fpp = plan(cfg, chips=8, sharding="fsdp+pp", mesh=(4, 2), mini=4,
               accum=32, ctx=2048, moment_dtype="bfloat16", remat=1)
    # ZeRO over 4 shards cuts the stage-local master by 4
    pp2 = plan(cfg, chips=2, sharding="pp", mesh=(1, 2), mini=4,
               accum=32, ctx=2048, moment_dtype="bfloat16", remat=1)
    np.testing.assert_allclose(
        fpp["memory_bytes"]["master_fp32"],
        pp2["memory_bytes"]["master_fp32"] / 4, rtol=1e-6)
    assert "pp_ppermute" in fpp["collectives_bytes"]
    assert "fsdp_param_allgather" in fpp["collectives_bytes"]


def test_projection_is_positive_and_bound_labelled():
    from tools.pod_plan import plan

    cfg = OmniBioTAConfig(n_layer=8, n_embd=1024, n_head=8,
                          vocab_size=2 ** 16, block_size=2048)
    out = plan(cfg, chips=8, sharding="fsdp", mesh=None, mini=16,
               accum=8, ctx=1024)
    proj = out["projection"]
    assert proj["tokens_per_sec"] > 0
    assert proj["bound"] in ("compute", "ici")
    assert proj["step_s"] >= out["times_s"]["compute"] * 0.999
