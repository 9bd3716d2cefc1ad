"""Load the reference PyTorch model as a *test oracle only*.

The reference (read-only at /root/reference) imports the unavailable `mup`
package solely for MuReadout; for fp32 encode()/logits parity checks we stub
MuReadout with a plain nn.Linear (no width division) and neutralise the µP
readout scale on the JAX side by setting mup_base_n_embd = n_embd.

This module imports the reference — it never copies it.
"""
import sys
import types


def _make_mu_readout():
    import torch.nn as nn

    class MuReadout(nn.Linear):
        pass

    # pickle records classes by (module, qualname): claiming mup.MuReadout
    # makes torch.save of a stub-built module produce EXACTLY what a real
    # mup install would, so converter tests exercise the real unpickle path
    MuReadout.__module__ = "mup"
    MuReadout.__qualname__ = "MuReadout"
    return MuReadout


def load_reference_model_module():
    if "mup" not in sys.modules:
        mup_stub = types.ModuleType("mup")
        mup_stub.MuReadout = _make_mu_readout()
        sys.modules["mup"] = mup_stub

    sys.path.insert(0, "/root/reference/training")
    try:
        import importlib
        ref_model = importlib.import_module("model")
    finally:
        sys.path.pop(0)
    return ref_model


def build_reference(cfg_kwargs, seed=0):
    """Construct a reference OmniBioTA in fp32, eval mode, flash disabled."""
    import torch

    ref = load_reference_model_module()
    torch.manual_seed(seed)
    config = ref.OmniBioTAConfig(**cfg_kwargs)
    config.flash = False  # monkey-patched field, as train_encoder.py:152 does
    m = ref.OmniBioTA(config)
    m = m.float().eval()
    return m, config
