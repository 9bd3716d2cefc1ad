"""Load the reference PyTorch model as a *test oracle only*.

The reference (read-only at /root/reference) imports the unavailable `mup`
package solely for MuReadout; for fp32 encode()/logits parity checks we stub
MuReadout with a plain nn.Linear (no width division) and neutralise the µP
readout scale on the JAX side by setting mup_base_n_embd = n_embd.

This module imports the reference — it never copies it.
"""
import sys
import types


def load_reference_model_module():
    import torch.nn as nn

    if "mup" not in sys.modules:
        mup_stub = types.ModuleType("mup")

        class MuReadout(nn.Linear):
            pass

        mup_stub.MuReadout = MuReadout
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
