"""Analytic FLOPs for the Pallas custom calls XLA's cost model can't see.

`compiled.cost_analysis()["flops"]` enumerates HLO ops only — custom calls
(the flash-attention forward/backward kernels, ops/pallas_attention.py) are
opaque to it, so an MFU computed from it UNDERCOUNTS by exactly the
attention-score work.  The shapes are static, so the missing FLOPs are
exactly enumerable:

  one attention site, forward:  QK^T + PV           = 2 matmuls
  flash backward (fused dq+dkv, ops/pallas_attention.py): recompute S,
    dV = P^T dO, dP = dO V^T, dK = dS^T Q, dQ = dS K = 5 matmuls

each matmul over [Tq, D] x [D, Tk]-shaped contractions = 2*B*H*Tq*Tk*D
FLOPs.  Which sites are custom calls is decided by the SAME gate the model
uses (`ops.attention.flash_active`), so this accounting tracks the real
routing:

  whisper training (batch bench config, ops routing at seq 1500):
    - encoder self-attention  Tq=Tk=1500 -> flash (missed by cost_analysis)
    - decoder cross-attention Tq=label_len, Tk=1500 -> flash (missed)
    - decoder self-attention  Tq=Tk=label_len(100) -> XLA einsum (counted)
  wav2vec2 training: T~=100 -> every site XLA (nothing missed; the only
    custom calls are the fused-dropout/GN kernels, whose FLOPs are
    elementwise-negligible).

True (unpadded) sequence lengths are used — MFU is model FLOPs over peak,
not hardware-padded FLOPs (the flash pad 1500->1536 would inflate it 2.4%).

Reference parity note: the reference's TF profiler has no MFU at all; this
is the repo's own exactness fix (VERDICT r4 item 2, bench.py:161).
"""

from __future__ import annotations

from tethys_tpu.ops.attention import flash_active

# Matmul FLOPs per attention site per pass: see module docstring.
_FWD_MATMULS = 2
_BWD_MATMULS = 5


def _site_flops(batch: int, heads: int, tq: int, tk: int, head_dim: int,
                training: bool, fwd_recomputes: int = 0) -> float:
    """FLOPs of ONE flash attention site. `fwd_recomputes` counts extra
    whole-forward replays (whole-loss jax.checkpoint replays the fwd kernel;
    remat_layers with the save_flash policy does NOT — flash_o/flash_lse are
    saved)."""
    per_matmul = 2.0 * batch * heads * tq * tk * head_dim
    matmuls = _FWD_MATMULS * (1 + fwd_recomputes)
    if training:
        matmuls += _BWD_MATMULS
    return per_matmul * matmuls


def whisper_custom_call_flops(config, batch: int, label_len: int,
                              feature_frames: int = 3000, *,
                              training: bool = True,
                              whole_loss_remat: bool = False) -> float:
    """FLOPs of the flash custom calls in one whisper train/eval step.

    Routing mirrors models/whisper.py: encoder self-attention at the conv
    stem's output length (stride-2 -> ceil(frames/2)), decoder cross at
    (label_len x enc_len), decoder self at label_len (XLA path when the
    gate rejects it — contributes 0 here because cost_analysis counts it).
    """
    enc_len = -(-feature_frames // 2)
    use_flash = getattr(config, "use_flash_attention", True)
    head_dim = config.d_model // config.encoder_attention_heads
    recomp = 1 if whole_loss_remat else 0
    total = 0.0
    if flash_active(use_flash, enc_len, enc_len):
        total += config.encoder_layers * _site_flops(
            batch, config.encoder_attention_heads, enc_len, enc_len,
            head_dim, training, recomp)
    if flash_active(use_flash, label_len, enc_len):
        total += config.decoder_layers * _site_flops(
            batch, config.decoder_attention_heads, label_len, enc_len,
            head_dim, training, recomp)
    if flash_active(use_flash, label_len, label_len):
        total += config.decoder_layers * _site_flops(
            batch, config.decoder_attention_heads, label_len, label_len,
            head_dim, training, recomp)
    return total


def wav2vec2_custom_call_flops(config, batch: int, frames: int, *,
                               training: bool = True) -> float:
    """Wav2vec2's encoder self-attention at pretraining clip lengths
    (T~100) never passes the flash gate, so nothing is missing from
    cost_analysis; kept as an explicit 0-or-value so bench.py treats both
    families uniformly (and stays correct if someone benches 30 s clips,
    where T~1000 WOULD route to flash)."""
    use_flash = getattr(config, "use_flash_attention", False)
    if not flash_active(use_flash, frames, frames):
        return 0.0
    head_dim = config.hidden_size // config.num_attention_heads
    return config.num_hidden_layers * _site_flops(
        batch, config.num_attention_heads, frames, frames, head_dim,
        training)
