"""Tensor-parallel (dp x tp) training over a 2-D device mesh — extension.

The reference implements only synchronous data parallelism (SURVEY §2.6);
this module is the clearly-labeled extension that lets Whisper-medium/large
span chips on a pod slice: a ('data', 'model') mesh where

* batch is sharded over 'data',
* the Megatron-style param sharding puts each attention/FFN block's first
  matmul column-parallel and second matmul row-parallel over 'model'
  (q/k/v + fc1 kernels sharded on the output dim, out_proj + fc2 on the
  input dim), embeddings/lm_head sharded on the vocab dim,

and `jax.jit` with NamedSharding-annotated params lets XLA insert the
all-reduces on ICI (the scaling-book recipe: pick a mesh, annotate shardings,
let the compiler place collectives).

Cross-replica aggregation keeps the REFERENCE semantics (round-3 fix; the
round-2 trainer silently switched to global-mean): the step body is
dp.make_train_step's replica step run under a *partial-manual* shard_map —
'data' manual (so the SUM-of-replica-losses logging contract and, for
wav2vec2, the hardened NaN-scrub / 1/N / per-replica-clip chain hold
per model-parallel group exactly as they hold per GPU in the reference,
speech_jobs/wav2vec2_dist.py:1186-1260), while 'model' stays GSPMD-auto so
XLA keeps partitioning the Megatron-sharded matmuls inside each group.
A "replica" here is one model-parallel group (the unit that holds a full
set of params), the analogue of the reference's one-GPU worker.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tethys_tpu.parallel.dp import TrainState
from tethys_tpu.parallel.mesh import place_tree


def make_2d_mesh(num_devices: Optional[int] = None,
                 model_parallel: int = 2) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devices)} device(s) are available "
                f"(platform={devices[0].platform if devices else 'none'})"
            )
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by tp={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


# Megatron-style sharding rules keyed on flax param path suffixes.
# Each rule returns the spec for the UNSTACKED leaf; when the leaf carries a
# leading scan-over-layers stack dim ([L, ...] under an `nn.scan`'d "layers"
# collection), a leading None is prepended so the rule still lands on the
# right tensor dims.
def _spec_for(path: Tuple[str, ...], leaf) -> P:
    names = [str(p) for p in path]
    joined = "/".join(names)

    def last_is(*keys):
        return any(joined.endswith(k) for k in keys)

    def rule(expected_rank: int, *spec_entries) -> P:
        ndim = getattr(leaf, "ndim", expected_rank)
        if ndim == expected_rank + 1 and "layers" in names:
            return P(None, *spec_entries)
        return P(*spec_entries)

    # Column-parallel: output dim sharded.
    if last_is("q_proj/kernel", "k_proj/kernel", "v_proj/kernel",
               "fc1/kernel", "intermediate_dense/kernel"):
        return rule(2, None, "model")
    if last_is("q_proj/bias", "k_proj/bias", "v_proj/bias",
               "fc1/bias", "intermediate_dense/bias"):
        return rule(1, "model")
    # Row-parallel: input dim sharded (output all-reduced by XLA).
    if last_is("out_proj/kernel", "fc2/kernel", "output_dense/kernel"):
        return rule(2, "model", None)
    # Vocab-sharded embedding / LM head.
    if last_is("embed_tokens/embedding"):
        return rule(2, "model", None)
    if last_is("lm_head/kernel"):
        return rule(2, None, "model")
    # Conv kernels [k, in, out]: shard output channels (whisper conv1/conv2,
    # wav2vec2 feature-extractor convs; the grouped pos_conv_embed stays
    # replicated — channel-sharding grouped convs fights GSPMD).
    if (last_is("conv1/kernel", "conv2/kernel")
            or any(n.startswith("conv_") for n in names) and joined.endswith("kernel")):
        if "pos_conv_embed" not in joined:
            return rule(3, None, None, "model")
    if last_is("conv1/bias", "conv2/bias"):
        return rule(1, "model")
    # Quantizer: codebook [G, V, d] sharded over codevectors; its input
    # projection column-parallel (distance argmin over the sharded V dim is
    # reduced by GSPMD).
    if last_is("quantizer/codevectors"):
        return rule(3, None, "model", None)
    if last_is("project_to_codevector_dim/kernel"):
        return rule(2, None, "model")
    if last_is("project_to_codevector_dim/bias"):
        return rule(1, "model")
    return P()  # replicate everything else (norms, small heads)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    def lookup(path, leaf):
        key = tuple(str(getattr(k, "key", k)) for k in path)
        return NamedSharding(mesh, _spec_for(key, leaf))

    return jax.tree_util.tree_map_with_path(lookup, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Megatron-shard host params over the mesh via local shard
    materialization (mesh.place_tree, which see)."""
    return place_tree(params, param_shardings(params, mesh))


def constrain_params(params: Any) -> Any:
    """Re-pin every param leaf's 'model'-axis sharding against the mesh in
    scope (the abstract mesh inside the partial-manual shard_map body), so
    GSPMD cannot silently replicate the Megatron shardings inside the
    replica region."""
    am = jax.sharding.get_abstract_mesh()

    def pin(path, leaf):
        spec = _spec_for(
            tuple(str(getattr(k, "key", k)) for k in path), leaf)
        return jax.lax.with_sharding_constraint(
            leaf, NamedSharding(am, spec))

    return jax.tree_util.tree_map_with_path(pin, params)


def make_tp_train_step(
    loss_fn: Callable,                  # (params, batch, rng) -> (loss, aux)
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    remat: bool = False,
    hardened: bool = False,
    return_aux: bool = False,
    grad_aux_fn: Optional[Callable[[Any], Any]] = None,
    grad_accum: int = 1,
):
    """Train step over the (data, model) mesh with the reference's
    aggregation semantics (see module doc): dp.make_train_step's replica
    body under a partial-manual shard_map — 'data' manual, 'model' auto.

    `hardened=True` selects the wav2vec2 dist-job chain (NaN scrub, 1/N
    loss scale, per-replica global-norm clip before the psum); `remat=True`
    checkpoints the forward (matmul outputs saveable) for
    whisper-medium/large HBM fits.  `return_aux`/`grad_aux_fn` mirror the
    DP step (tensorsize-profiler plumbing).
    """
    from tethys_tpu.parallel import dp as dp_lib

    return dp_lib.make_train_step(
        loss_fn, optimizer, mesh,
        hardened=hardened,
        return_aux=return_aux,
        grad_aux_fn=grad_aux_fn,
        remat=remat,
        param_constraint=constrain_params,
        grad_accum=grad_accum,
    )


def init_tp_state(params: Any, optimizer: optax.GradientTransformation,
                  mesh: Mesh, param_dtype=None) -> TrainState:
    """Shard params over the mesh; Adam moments inherit the shardings
    (optimizer.init builds them with zeros_like, which preserves sharding).

    `param_dtype=jnp.bfloat16` stores the master params in bf16 (halves the
    param HBM for large models; pair with an optimizer whose moments stay
    f32, e.g. `optax.adam(..., mu_dtype=jnp.float32)`).  Extension beyond
    the reference (which has no model-parallel path at all).
    """
    if param_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(param_dtype), params)
    sharded = shard_params(params, mesh)
    return TrainState(sharded, optimizer.init(sharded))
