"""TRAJECTORY-level training parity vs the TF reference (north-star claim:
"training steps bit-comparable, <1e-3 rel loss diff").

test_tf_reference_parity.py pins forward/loss parity on one batch; this
harness runs ~20 full optimizer steps of the reference's own train-step
semantics side by side with `dp.make_train_step` from identical ported
weights and identical per-step data, and asserts the LOSS TRAJECTORIES
agree per step.  Single-step parity cannot catch a wrong Adam-epsilon
placement or a clip-before-vs-after-aggregation divergence that compounds
over steps — this can.

Reference semantics reproduced per family:
  whisper (whisper_dist.py:819-848, 894-901): grads of the unscaled mean
    CE, no clipping, Keras Adam(lr=1e-4, eps=1e-7).  The decoder runs with
    a proper causal mask injected on the reference side (quirk #12 — its
    default mask is inverted; see test_tf_reference_parity docstring).
  wav2vec2 (wav2vec2_dist.py:1186-1260, 1271-1275): NaN->0 scrub, loss
    scaled by 1/num_replicas, None-grads->zeros, global-norm clip 1.0,
    then Keras Adam(eps=1e-8, clipnorm=1.0) — i.e. the double-clip quirk
    #8.  Negative sampling is RNG-incompatible across frameworks, so the
    SAME fixed negative indices are injected on both sides every step.

Both references run on CPU TF; our side runs the real jitted
dp.make_train_step on a 1-device mesh.

Tolerances.  Whisper's trajectory is well-conditioned: a flat <1e-3
per-step bound holds over all 20 steps.  Wav2Vec2's is NOT: its hard
PQ quantizer takes argmins over codevector distances whose margins at
random init sit near f32 resolution, so ANY precision change flips
selections and discontinuously moves a loss of magnitude ~100 — we
measured our own f32-vs-f64 run (same weights, same batches, same code)
drifting to 5e-2 by step 10, an order MORE than the f32 TF-vs-JAX gap.
A flat 1e-3 over 20 steps is therefore unattainable in f32 by any
implementation (including the reference vs itself at higher precision).
The wav2vec2 test instead runs a third arm — our step at float64 on the
identical weights/batches — and asserts the cross-framework drift stays
within 2x that MEASURED intrinsic conditioning envelope, and within the
strict 1e-3 wherever the envelope itself is tighter than 5e-4.  (The
reference side is deterministic and non-chaotic: a 1e-7 single-weight
perturbation stays at ~1e-7 over all 20 steps — so the envelope reflects
conditioning, not chaos.)
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_tf_reference_parity import (  # noqa: E402
    WHISPER_REF, W2V2_REF, _load, _tiny_whisper_cfg,
    port_whisper_weights, port_w2v2_weights,
)

N_STEPS = 20
REL_TOL = 1e-3


def _mesh1():
    from tethys_tpu.parallel.mesh import make_data_mesh

    return make_data_mesh(1)


def _rel_diff(a: float, b: float) -> float:
    return abs(a - b) / max(abs(b), 1e-9)


# ---------------------------------------------------------------------------
# Whisper


def test_whisper_train_trajectory_parity():
    from tethys_tpu.models.whisper import create_whisper_model
    from tethys_tpu.parallel import dp

    ref_mod = _load(WHISPER_REF, "ref_whisper_traj")
    cfg = _tiny_whisper_cfg(ref_mod)
    tf.random.set_seed(0)
    ref_model = ref_mod.WhisperForConditionalGeneration(cfg)

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(N_STEPS):
        feats = rng.standard_normal((2, cfg.n_mels, 2 * cfg.n_ctx),
                                    dtype=np.float32)
        labels = rng.integers(3, cfg.vocab_size - 5,
                              size=(2, 12)).astype(np.int32)
        batches.append((feats, labels))
    ref_model(tf.constant(batches[0][0]), labels=tf.constant(batches[0][1]),
              training=True)  # build weights

    model, _ = create_whisper_model(
        "tiny",
        d_model=cfg.d_model, encoder_layers=cfg.encoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_layers=cfg.decoder_layers,
        decoder_attention_heads=cfg.decoder_attention_heads,
        d_ff=cfg.d_ff, n_mels=cfg.n_mels, n_ctx=cfg.n_ctx,
        vocab_size=cfg.vocab_size,
        max_target_positions=cfg.max_target_positions,
        decoder_start_token_id=cfg.decoder_start_token_id,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        compute_dtype="float32",
    )
    params = port_whisper_weights(ref_model)

    # --- reference side: 20 steps of the reference train_step semantics
    # (whisper_dist.py:819-848 — unscaled loss, no clip) with the causal
    # mask injected so both sides compute the same math (quirk #12).
    opt = tf.keras.optimizers.Adam(learning_rate=1e-4)  # eps default 1e-7
    scce = tf.keras.losses.SparseCategoricalCrossentropy(
        from_logits=True, reduction="none")
    t_dec = batches[0][1].shape[1]
    causal_keep = tf.linalg.band_part(tf.ones((t_dec, t_dec)), -1, 0)[None]
    start = np.full((2, 1), cfg.decoder_start_token_id, np.int32)

    # NOTE: the reference classes use symbolic-tensor-as-bool patterns that
    # AutoGraph rejects (e.g. `if tf.equal(...)`) — they only ever ran under
    # eager/strategy.run in the reference too, so the steps run eagerly here.
    def ref_step(feats, labels):
        dec_ids = tf.concat([tf.constant(start), labels[:, :-1]], axis=1)
        with tf.GradientTape() as tape:
            enc = ref_model.model.encoder(
                feats, training=True)["last_hidden_state"]
            dec = ref_model.model.decoder(
                dec_ids, enc, attention_mask=causal_keep,
                training=True)["last_hidden_state"]
            logits = ref_model.lm_head(dec)
            # Reference loss formula (whisper_dist.py:583-600), unmasked mean.
            loss = tf.reduce_mean(scce(labels[:, 1:], logits[:, :-1, :]))
        grads = tape.gradient(loss, ref_model.trainable_variables)
        opt.apply_gradients(zip(grads, ref_model.trainable_variables))
        return loss

    w0 = ref_model.trainable_variables[0].numpy().copy()
    ref_losses = [float(ref_step(tf.constant(f), tf.constant(l)))
                  for f, l in batches]

    # --- our side: the real jitted DP step on a 1-device mesh.
    mesh = _mesh1()

    def loss_fn(p, batch, step_rng):
        f, l = batch
        out = model.apply({"params": p}, f, labels=l, deterministic=True)
        return out["loss"], {}

    optimizer = dp.whisper_optimizer(1e-4)
    step = dp.make_train_step(loss_fn, optimizer, mesh, hardened=False)
    state = dp.replicate_state(
        dp.TrainState(params, optimizer.init(params)), mesh)

    our_losses = []
    for f, l in batches:
        batch = dp.shard_batch((jnp.asarray(f), jnp.asarray(l)), mesh)
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        our_losses.append(float(jax.device_get(loss)))

    worst = max(_rel_diff(o, r) for o, r in zip(our_losses, ref_losses))
    assert worst < REL_TOL, (
        f"whisper trajectory diverged: worst per-step rel diff {worst:.2e}\n"
        f"ref:  {ref_losses}\nours: {our_losses}")
    # The optimizers must actually be doing work (weights moved) — each
    # step sees a different random batch, so comparing first-vs-last LOSS
    # would be noise, not signal.
    assert not np.allclose(w0, ref_model.trainable_variables[0].numpy())


# ---------------------------------------------------------------------------
# Wav2Vec2 (hardened chain)


def test_w2v2_train_trajectory_parity():
    from tethys_tpu import losses as our_losses
    from tethys_tpu.models.wav2vec2 import create_full_model
    from tethys_tpu.parallel import dp

    ref_mod = _load(W2V2_REF, "ref_w2v2_traj")
    cfg = ref_mod.Wav2Vec2Config("tiny")
    cfg.hidden_dropout = cfg.activation_dropout = cfg.attention_dropout = 0.0
    tf.random.set_seed(0)
    ref_model = ref_mod.Wav2Vec2ForPreTraining(cfg)

    rng = np.random.default_rng(0)
    batches = [rng.standard_normal((2, 4000), dtype=np.float32)
               for _ in range(N_STEPS)]
    out0 = ref_model(tf.constant(batches[0]), training=True)  # build weights
    t = int(out0["projected_states"].shape[1])
    k = cfg.num_negatives
    fixed = np.random.default_rng(7).integers(0, t, size=(2, k)).astype(
        np.int32)
    tiled = np.tile(fixed[:, None, :], (1, t, 1))  # ref's [B, T, K] layout
    ref_model._sample_negative_indices = (
        lambda seq_len, batch_size: tf.constant(tiled))

    params_np = jax.tree_util.tree_map(np.asarray,
                                       port_w2v2_weights(ref_model))

    # --- reference side: the hardened train_step
    # (wav2vec2_dist.py:1186-1260) on one replica + Adam(eps=1e-8,
    # clipnorm=1.0) (wav2vec2_dist.py:1271-1275).
    opt = tf.keras.optimizers.Adam(
        learning_rate=3e-5, epsilon=1e-8, clipnorm=1.0)

    def ref_step(audio):
        with tf.GradientTape() as tape:
            outputs = ref_model(audio, training=True)
            logits, contrastive = ref_model._compute_contrastive_loss(
                outputs["projected_states"],
                outputs["projected_quantized_features"])
            diversity = ref_model._compute_diversity_loss(
                outputs["codevector_perplexity"])
            loss = contrastive + ref_model.diversity_loss_weight * diversity
            loss = tf.where(tf.math.is_nan(loss), tf.constant(0.0), loss)
            scaled = loss / 1.0  # num_replicas_in_sync == 1
        grads = tape.gradient(scaled, ref_model.trainable_variables)
        grads = [tf.zeros_like(v) if g is None else g
                 for g, v in zip(grads, ref_model.trainable_variables)]
        grads, _ = tf.clip_by_global_norm(grads, 1.0)
        opt.apply_gradients(zip(grads, ref_model.trainable_variables))
        return scaled

    ref_losses = [float(ref_step(tf.constant(a))) for a in batches]

    # --- our side: dp.make_train_step(hardened=True) + wav2vec2_optimizer
    # (per-variable clipnorm + Adam eps=1e-8), same fixed negatives.
    mesh = _mesh1()
    fixed_j = jnp.asarray(fixed)

    def run_ours(dtype):
        model, _ = create_full_model(
            "pretraining", "tiny",
            hidden_dropout=0.0, activation_dropout=0.0,
            attention_dropout=0.0, compute_dtype=dtype,
        )
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype), params_np)

        def loss_fn(p, batch, step_rng):
            audio, _ = batch
            outputs = model.apply({"params": p}, audio, training=True)
            _, contrastive = our_losses.contrastive_loss(
                outputs["projected_states"],
                outputs["projected_quantized_features"],
                step_rng, num_negatives=k,
                temperature=cfg.contrastive_logits_temperature,
                negative_indices=fixed_j)
            diversity = our_losses.diversity_loss(
                outputs["codevector_perplexity"])
            return contrastive + cfg.diversity_loss_weight * diversity, {}

        optimizer = dp.wav2vec2_optimizer(3e-5)
        step = dp.make_train_step(loss_fn, optimizer, mesh, hardened=True)
        state = dp.replicate_state(
            dp.TrainState(params, optimizer.init(params)), mesh)
        out = []
        labels = jnp.zeros((2,), jnp.float32)
        for a in batches:
            batch = dp.shard_batch((jnp.asarray(a, dtype), labels), mesh)
            state, loss = step(state, batch, jax.random.PRNGKey(0))
            out.append(float(jax.device_get(loss)))
        return out

    ours_f32 = run_ours("float32")
    # Third arm: the SAME step at float64 — measures the trajectory's
    # intrinsic precision-conditioning (see module docstring).
    jax.config.update("jax_enable_x64", True)
    try:
        ours_f64 = run_ours("float64")
    finally:
        jax.config.update("jax_enable_x64", False)

    env = 0.0  # running max of our own f32-vs-f64 drift
    report = []
    for i, (o32, o64, r) in enumerate(zip(ours_f32, ours_f64, ref_losses)):
        env = max(env, _rel_diff(o32, o64))
        cross = _rel_diff(o32, r)
        bound = max(REL_TOL, 2.0 * env) if env > 5e-4 else REL_TOL
        report.append(f"step {i:2d}: ref={r:.4f} ours={o32:.4f} "
                      f"cross={cross:.2e} f32/f64 env={env:.2e}")
        assert cross < bound, (
            "wav2vec2 trajectory diverged beyond the measured f32 "
            f"conditioning envelope at step {i}: cross={cross:.2e} "
            f"bound={bound:.2e}\n" + "\n".join(report))
