"""Tiresias-style per-iteration tensor-size + skewness profiler.

Capability-parity rebuild of the reference `TensorProfiler`
(reference speech_jobs/whisper_dist_tensorsize.py:20-458 and
wav2vec2_dist_tensorsize.py:30-530) redesigned for XLA:

* Under jit there are no eager tensors to hook, and shapes are static — so
  **byte accounting is computed from shape/dtype structures** (params, grads,
  inputs, model outputs, and flax `capture_intermediates` module outputs, the
  native equivalent of the reference's TensorLoggingMixin injection).  This is
  exact and costs zero device time, unlike the reference's per-tensor eager
  walk.
* **Per-value skewness** (wav2vec2 flavor, reference
  wav2vec2_dist_tensorsize.py:72-106) is computed *in-graph* as scalars
  (`E[((x-mean)/std)^3]` with the reference's 1e-8 epsilons) and returned
  through the train step's aux output — one scalar per logged tensor, fused
  by XLA into the step.
* Size-distribution skewness uses the Fisher-Pearson estimator
  (scipy.stats.skew semantics) implemented in numpy.

Log files and formats mirror the reference exactly: `tensor_sizes.txt`,
`memory_usage.txt`, `summary.txt`, `tiresias_tensorsize.txt`,
`skewness_analysis.{txt,json}`, `final_summary.json`, `tiresias_result.json`,
`legacy_skewness_result.txt`, plus the per-task `/result` copies
(`*_tensor_summary.txt`, `*_tiresias.txt`, `*_skewness.txt`, `*_combined.txt`
— reference wav2vec2_dist_tensorsize.py:2215-2259).  Tiresias tensorsize =
mean per-step total MB after dropping min(3, steps//4) warm-up steps
(reference whisper_dist_tensorsize.py:207-222).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# In-graph value statistics (wav2vec2 flavor)

def value_skewness(x: jax.Array) -> jax.Array:
    """Scalar E[((x - mean)/std)^3] with the reference's epsilons."""
    flat = x.reshape(-1).astype(jnp.float32)
    mean = jnp.mean(flat)
    variance = jnp.mean(jnp.square(flat - mean))
    std = jnp.sqrt(variance + 1e-8)
    normalized = (flat - mean) / (std + 1e-8)
    return jnp.mean(normalized ** 3)


def tree_value_skewness(tree: Any, prefix: str) -> Dict[str, jax.Array]:
    """{name: skew scalar} over all array leaves of a pytree."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = prefix + "/" + "/".join(_path_str(k) for k in path)
        if hasattr(leaf, "size") and leaf.size > 1:
            out[name] = value_skewness(leaf)
    return out


def _path_str(key) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(key, attr):
            return str(getattr(key, attr))
    return str(key)


# ---------------------------------------------------------------------------
# Static inventories

def _nbytes(shape, dtype) -> int:
    return int(np.prod(shape, dtype=np.int64)) * np.dtype(dtype).itemsize


def tensor_inventory_from_tree(tree: Any, prefix: str) -> List[Tuple[str, tuple, str, int]]:
    """[(name, shape, dtype, bytes)] for every array leaf of a pytree
    (works on concrete arrays and ShapeDtypeStructs alike)."""
    items = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None or not hasattr(leaf, "shape"):
            continue
        name = prefix + "/" + "/".join(_path_str(k) for k in path) if path else prefix
        dtype = np.dtype(leaf.dtype).name
        items.append((name, tuple(leaf.shape), dtype, _nbytes(leaf.shape, leaf.dtype)))
    return items


def intermediate_inventory(model, params, *args, method=None, **kwargs):
    """Per-module activation inventory via flax capture_intermediates under
    jax.eval_shape — the XLA-native equivalent of the reference's
    TensorLoggingMixin/`setup_model_profiling` recursive injection
    (whisper_dist_tensorsize.py:1492-1525).  Zero device compute."""

    # Split array-like kwargs (traced through eval_shape) from static ones
    # (e.g. `deterministic`, used in Python control flow inside flax).
    def is_arraylike(x):
        return hasattr(x, "shape") and hasattr(x, "dtype")

    traced_kwargs = {
        k: v for k, v in kwargs.items()
        if is_arraylike(v) or (isinstance(v, dict)
                               and all(is_arraylike(x) for x in v.values()))
    }
    static_kwargs = {k: v for k, v in kwargs.items() if k not in traced_kwargs}

    def run(params, *t_args, **t_kwargs):
        out, mods = model.apply(
            {"params": params}, *t_args, capture_intermediates=True,
            mutable=["intermediates"], method=method,
            **t_kwargs, **static_kwargs,
        )
        return mods["intermediates"]

    shapes = jax.eval_shape(run, params, *args, **traced_kwargs)
    return tensor_inventory_from_tree(shapes, "activation")


def whisper_intra_op_inventory(config, batch_size: int,
                               enc_len: int = 1500, dec_len: int = 100,
                               ) -> List[Tuple[str, tuple, str, int]]:
    """Analytic census of the reference profiler's INTRA-OP track points
    (reference whisper_dist_tensorsize.py:646-777): attention scores and
    softmax probs ([B,H,Tq,Tkv] — the largest activations in the model),
    the pre-merge attention output, the decoder's additive mask, and the
    gelu output.  None of these are flax module outputs, so the
    capture_intermediates inventory cannot see them; shapes are static
    under jit, so they are enumerated analytically (exact, zero device
    cost) and appended to the activation census each step.

    q/k/v states are also enumerated here: WhisperAttention's fused
    projection kernels (ops/pallas_qkv.py) produce them inside the op body,
    so they are not module outputs either.  Reference points whose bytes the
    module-output census already holds once (fc1/fc2 outputs, out_proj
    output = the attention module's return, block inputs = the previous
    module's output) are NOT repeated — see PARITY.md for the mapping."""
    act = np.dtype(config.dtype).name if hasattr(config, "dtype") else "float32"
    H_e, H_d = config.encoder_attention_heads, config.decoder_attention_heads
    d_e, d_d = config.d_model // H_e, config.d_model // H_d
    B = batch_size
    items: List[Tuple[str, tuple, str, int]] = []

    def add(name, shape, dtype):
        items.append((name, tuple(shape), np.dtype(dtype).name,
                      _nbytes(shape, dtype)))

    def attention(prefix, heads, head_dim, t_q, t_kv, mask=False):
        add(f"{prefix}/query_states", (B, heads, t_q, head_dim), act)
        add(f"{prefix}/key_states", (B, heads, t_kv, head_dim), act)
        add(f"{prefix}/value_states", (B, heads, t_kv, head_dim), act)
        add(f"{prefix}/attention_scores", (B, heads, t_q, t_kv), act)
        if mask:
            # reference casts the additive mask to float32 before logging
            add(f"{prefix}/attention_mask", (B, t_q, t_kv), "float32")
        add(f"{prefix}/attention_probs", (B, heads, t_q, t_kv), act)
        add(f"{prefix}/attention_output_raw", (B, heads, t_q, head_dim), act)

    for i in range(config.encoder_layers):
        attention(f"encoder/layers_{i}/self_attn", H_e, d_e, enc_len, enc_len)
        add(f"encoder/layers_{i}/feed_forward/activation_output",
            (B, enc_len, config.d_ff), act)
    for i in range(config.decoder_layers):
        attention(f"decoder/layers_{i}/self_attn", H_d, d_d, dec_len, dec_len,
                  mask=True)
        attention(f"decoder/layers_{i}/cross_attn", H_d, d_d, dec_len, enc_len)
        add(f"decoder/layers_{i}/feed_forward/activation_output",
            (B, dec_len, config.d_ff), act)
    return items


def wav2vec2_intra_op_inventory(config, batch_size: int, frames: int,
                                ) -> List[Tuple[str, tuple, str, int]]:
    """Wav2vec2-flavor intra-op census (reference
    wav2vec2_dist_tensorsize.py attention track points): per encoder layer,
    attention_scores and attention_probs [B,H,T,T].  q/k/v states equal the
    q/k/v Dense outputs the module census already counts once; the
    reference's conv/posenc/final-output points are module outputs too."""
    act = np.dtype(config.dtype).name if hasattr(config, "dtype") else "float32"
    H = config.num_attention_heads
    B = batch_size
    items: List[Tuple[str, tuple, str, int]] = []
    for i in range(config.num_hidden_layers):
        for point in ("attention_scores", "attention_probs"):
            shape = (B, H, frames, frames)
            items.append((f"encoder/layers_{i}/attention/{point}",
                          shape, act, _nbytes(shape, act)))
    return items


def conv_output_length(length: int, strides) -> int:
    """TF SAME-padding frame count through the conv stack (the feature
    extractor's arithmetic — models/wav2vec2.py:49-85)."""
    for s in strides:
        length = -(-length // s)
    return length


def fisher_pearson_skew(values: List[float]) -> float:
    """scipy.stats.skew (bias=True) semantics in numpy."""
    arr = np.asarray(values, dtype=np.float64)
    if arr.size < 3:
        return 0.0
    m = arr.mean()
    m2 = np.mean((arr - m) ** 2)
    if m2 == 0:
        return 0.0
    m3 = np.mean((arr - m) ** 3)
    return float(m3 / m2 ** 1.5)


def device_memory_mb() -> float:
    """Current device bytes-in-use (libtpu memory_stats) in MB; 0 if absent."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return float(stats.get("bytes_in_use", 0)) / (1024 * 1024)
    except Exception:  # noqa: BLE001 — metric sources vary per runtime
        pass
    return 0.0


def host_memory_mb() -> float:
    try:
        import psutil

        return psutil.Process().memory_info().rss / (1024 * 1024)
    except Exception:  # noqa: BLE001
        return 0.0


# Hard-coded external comparison constants printed by the reference next to
# its own measurement (reference wav2vec2_dist_tensorsize.py:2117-2164; these
# characterize *other* models, they are not tethys benchmarks).
REFERENCE_TENSORSIZE_MB = {
    "alexnet": 6.7, "vgg16": 527.8, "resnet50": 97.5, "inception3": 94.7,
    "bert": 1560.0, "gpt2": 4000.0,
}
REFERENCE_SKEWNESS = {
    "alexnet": 2.6, "vgg16": 2.2, "resnet50": 1.5, "inception3": 1.8,
    "bert": 9.2, "gpt2m": 9.9,
}


class TensorProfiler:
    """Per-step tensor byte accounting with the reference's file contracts."""

    def __init__(self, log_dir: Optional[str] = None,
                 model_name: str = "whisper_small",
                 flavor: str = "whisper"):
        from tethys_tpu.utils.artifacts import workspace_dir

        self.log_dir = log_dir or os.path.join(workspace_dir(), "tensor_logs")
        self.model_name = model_name
        self.flavor = flavor
        self.current_step = 0
        self.current_step_size = 0
        self.step_tensor_sizes: List[float] = []
        self.operation_tensor_sizes: Dict[str, List[int]] = {}
        self.tensor_details: List[dict] = []
        self.value_skews: Dict[str, List[float]] = {}
        self.memory_usage: List[dict] = []
        self.parameter_stats: Optional[dict] = None

        os.makedirs(self.log_dir, exist_ok=True)
        self.tensor_log_file = open(
            os.path.join(self.log_dir, "tensor_sizes.txt"), "w")
        if flavor == "wav2vec2":
            self.tensor_log_file.write(
                "step,operation,tensor_type,size_bytes,size_mb,shape,dtype\n")
        else:
            self.tensor_log_file.write(
                "step,operation,tensor_type,size_bytes,size_mb,shape\n")
        self.memory_log_file = open(
            os.path.join(self.log_dir, "memory_usage.txt"), "w")
        self.memory_log_file.write("step,gpu_memory_mb,cpu_memory_mb\n")
        self.summary_log_file = open(
            os.path.join(self.log_dir, "summary.txt"), "w")
        self.summary_log_file.write(
            "step,total_tensor_size_mb,num_operations,avg_tensor_size_mb\n")
        self.tiresias_log_file = open(
            os.path.join(self.log_dir, "tiresias_tensorsize.txt"), "w")
        self.tiresias_log_file.write("step,tensorsize_mb\n")
        print(f"TensorProfiler initialized - log dir: {self.log_dir}")

    # -- logging --------------------------------------------------------

    def log_tensor_size(self, name: str, shape, dtype,
                        tensor_type: str = "activation") -> int:
        size_bytes = _nbytes(shape, dtype)
        size_mb = size_bytes / (1024 * 1024)
        self.current_step_size += size_bytes
        self.operation_tensor_sizes.setdefault(name, []).append(size_bytes)
        self.tensor_details.append({
            "step": self.current_step, "operation": name,
            "tensor_type": tensor_type, "size_bytes": size_bytes,
            "size_mb": size_mb, "shape": list(shape),
        })
        shape_str = str(list(shape)).replace(",", ";")
        if self.flavor == "wav2vec2":
            self.tensor_log_file.write(
                f"{self.current_step},{name},{tensor_type},{size_bytes},"
                f"{size_mb:.4f},{shape_str},{np.dtype(dtype).name}\n")
        else:
            self.tensor_log_file.write(
                f"{self.current_step},{name},{tensor_type},{size_bytes},"
                f"{size_mb:.4f},{shape_str}\n")
        return size_bytes

    def log_inventory(self, inventory, tensor_type: str) -> None:
        for name, shape, dtype, _ in inventory:
            self.log_tensor_size(name, shape, dtype, tensor_type)

    def log_model_parameters(self, params) -> dict:
        total = 0
        for name, shape, dtype, nbytes in tensor_inventory_from_tree(
                params, "param"):
            self.log_tensor_size(name, shape, dtype, "parameter")
            total += nbytes
        self.parameter_stats = {
            "step": self.current_step,
            "total_parameters_mb": total / (1024 * 1024),
            "trainable_parameters_mb": total / (1024 * 1024),
            "non_trainable_parameters_mb": 0.0,
        }
        return self.parameter_stats

    def log_value_skews(self, skews: Dict[str, float]) -> None:
        for name, value in skews.items():
            self.value_skews.setdefault(name, []).append(float(value))

    def log_memory_usage(self) -> dict:
        info = {
            "step": self.current_step,
            "gpu_memory_mb": device_memory_mb(),
            "cpu_memory_mb": host_memory_mb(),
        }
        self.memory_usage.append(info)
        self.memory_log_file.write(
            f"{self.current_step},{info['gpu_memory_mb']:.2f},"
            f"{info['cpu_memory_mb']:.2f}\n")
        self.memory_log_file.flush()
        return info

    def start_step(self, step: int) -> None:
        self.current_step = step
        self.current_step_size = 0

    def end_step(self) -> float:
        step_size_mb = self.current_step_size / (1024 * 1024)
        self.step_tensor_sizes.append(step_size_mb)
        num_ops = len([d for d in self.tensor_details
                       if d["step"] == self.current_step])
        avg = step_size_mb / num_ops if num_ops else 0.0
        self.summary_log_file.write(
            f"{self.current_step},{step_size_mb:.4f},{num_ops},{avg:.4f}\n")
        self.summary_log_file.flush()
        self.tiresias_log_file.write(
            f"{self.current_step},{step_size_mb:.4f}\n")
        self.tiresias_log_file.flush()
        return step_size_mb

    # -- analytics ------------------------------------------------------

    def get_tiresias_tensorsize(self) -> float:
        if not self.step_tensor_sizes:
            return 0.0
        warmup = min(3, len(self.step_tensor_sizes) // 4)
        stable = self.step_tensor_sizes[warmup:]
        if not stable:
            return float(np.mean(self.step_tensor_sizes))
        return float(np.mean(stable))

    def calculate_tensor_skewness(self) -> float:
        sizes = [d["size_mb"] for d in self.tensor_details
                 if d["size_bytes"] > 0]
        return fisher_pearson_skew(sizes)

    def calculate_operation_skewness(self) -> Dict[str, float]:
        out = {}
        for op, sizes in self.operation_tensor_sizes.items():
            if len(sizes) >= 3:
                out[op] = fisher_pearson_skew(
                    [s / (1024 * 1024) for s in sizes])
        return out

    def calculate_layer_type_skewness(self) -> Dict[str, float]:
        by_type: Dict[str, List[float]] = {}
        for d in self.tensor_details:
            if d["size_mb"] > 0:
                by_type.setdefault(d["tensor_type"], []).append(d["size_mb"])
        return {t: fisher_pearson_skew(v)
                for t, v in by_type.items() if len(v) >= 3}

    def get_skewness_summary(self) -> dict:
        sizes = [d["size_mb"] for d in self.tensor_details if d["size_mb"] > 0]
        summary = {
            "model_skewness": self.calculate_tensor_skewness(),
            "operation_skewness": self.calculate_operation_skewness(),
            "layer_type_skewness": self.calculate_layer_type_skewness(),
            "tensor_count": len(sizes),
            "mean_tensor_size_mb": float(np.mean(sizes)) if sizes else 0,
            "std_tensor_size_mb": float(np.std(sizes)) if sizes else 0,
            "min_tensor_size_mb": float(np.min(sizes)) if sizes else 0,
            "max_tensor_size_mb": float(np.max(sizes)) if sizes else 0,
        }
        if self.value_skews:
            summary["value_skewness"] = {
                name: float(np.mean(vals))
                for name, vals in self.value_skews.items()
            }
        return summary

    def log_skewness_analysis(self) -> dict:
        summary = self.get_skewness_summary()
        with open(os.path.join(self.log_dir, "skewness_analysis.txt"), "w") as f:
            f.write("=== Tensor Skewness Analysis ===\n")
            f.write(f"Model Skewness: {summary['model_skewness']:.2f}\n")
            f.write(f"Total Tensors: {summary['tensor_count']}\n")
            f.write(f"Mean Tensor Size: {summary['mean_tensor_size_mb']:.4f} MB\n")
            f.write(f"Std Tensor Size: {summary['std_tensor_size_mb']:.4f} MB\n")
            f.write(f"Min Tensor Size: {summary['min_tensor_size_mb']:.4f} MB\n")
            f.write(f"Max Tensor Size: {summary['max_tensor_size_mb']:.4f} MB\n")
            f.write("\n=== Layer Type Skewness ===\n")
            for layer_type, skew in summary["layer_type_skewness"].items():
                f.write(f"{layer_type}: {skew:.2f}\n")
            f.write("\n=== Top 10 Operation Skewness ===\n")
            top = sorted(summary["operation_skewness"].items(),
                         key=lambda kv: abs(kv[1]), reverse=True)[:10]
            for op, skew in top:
                f.write(f"{op}: {skew:.2f}\n")
        with open(os.path.join(self.log_dir, "skewness_analysis.json"), "w") as f:
            json.dump(summary, f, indent=2, default=str)
        return summary

    def get_summary(self) -> dict:
        if not self.step_tensor_sizes:
            return {}
        skew = self.get_skewness_summary()
        summary = {
            "total_steps": len(self.step_tensor_sizes),
            "tiresias_tensorsize_mb": self.get_tiresias_tensorsize(),
            "avg_step_tensorsize_mb": float(np.mean(self.step_tensor_sizes)),
            "max_step_tensorsize_mb": float(np.max(self.step_tensor_sizes)),
            "min_step_tensorsize_mb": float(np.min(self.step_tensor_sizes)),
            "std_step_tensorsize_mb": float(np.std(self.step_tensor_sizes)),
            "total_operations": len(self.tensor_details),
            "step_tensor_sizes": self.step_tensor_sizes,
            "model_skewness": skew["model_skewness"],
            "skewness_analysis": skew,
            "avg_memory_usage": float(np.mean(
                [m["gpu_memory_mb"] for m in self.memory_usage]))
            if self.memory_usage else 0.0,
            "peak_memory_usage": float(np.max(
                [m["gpu_memory_mb"] for m in self.memory_usage]))
            if self.memory_usage else 0.0,
        }
        op_stats = {}
        for op, sizes in self.operation_tensor_sizes.items():
            op_stats[op] = {
                "total_size_mb": sum(sizes) / (1024 * 1024),
                "avg_size_mb": float(np.mean(sizes)) / (1024 * 1024),
                "count": len(sizes),
            }
        summary["operation_stats"] = op_stats
        return summary

    def save_final_results(self) -> dict:
        summary = self.get_summary()
        with open(os.path.join(self.log_dir, "final_summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=str)
        tiresias_result = {
            "model": self.model_name,
            "tensorsize_mb": summary.get("tiresias_tensorsize_mb", 0.0),
            "skewness": summary.get("model_skewness", 0.0),
            "total_steps": summary.get("total_steps", 0),
            "measurement_method": "Tiresias_style",
        }
        with open(os.path.join(self.log_dir, "tiresias_result.json"), "w") as f:
            json.dump(tiresias_result, f, indent=2)
        with open(os.path.join(self.log_dir,
                               "legacy_skewness_result.txt"), "w") as f:
            f.write("model,skewness\n")
            f.write(f"{self.model_name},"
                    f"{summary.get('model_skewness', 0.0):.1f}\n")
        self.log_skewness_analysis()
        return summary

    def write_result_copies(self, jct: float, task_type: str,
                            task_index: int) -> None:
        """Per-task /result copies (reference
        wav2vec2_dist_tensorsize.py:2215-2259)."""
        from tethys_tpu.utils.artifacts import read_model_name, result_dir

        name = read_model_name()
        if name is None:
            return
        base = os.path.join(result_dir(), name)
        prefix = f"{task_type}_{task_index}"
        summary = self.get_summary()
        tiresias = summary.get("tiresias_tensorsize_mb", 0.0)
        skew = summary.get("model_skewness", 0.0)
        try:
            with open(os.path.join(base, f"{prefix}_tensor_summary.txt"), "w") as f:
                f.write(f"Model Size: {self.model_name}\n")
                f.write(f"Total Steps: {summary.get('total_steps', 0)}\n")
                f.write(f"Average GPU Memory (MB): "
                        f"{summary.get('avg_memory_usage', 0.0):.2f}\n")
                f.write(f"Peak GPU Memory (MB): "
                        f"{summary.get('peak_memory_usage', 0.0):.2f}\n")
                f.write(f"Tiresias TensorSize (MB): {tiresias:.2f}\n")
                f.write(f"Model Skewness: {skew:.4f}\n")
                f.write(f"JCT (seconds): {jct:.2f}\n")
            with open(os.path.join(base, f"{prefix}_tiresias.txt"), "w") as f:
                f.write("model\ttensorsizes\n")
                f.write(f"{self.model_name}\t{tiresias:.1f}\n")
            with open(os.path.join(base, f"{prefix}_skewness.txt"), "w") as f:
                f.write("model,skewness\n")
                f.write(f"{self.model_name},{skew:.1f}\n")
            with open(os.path.join(base, f"{prefix}_combined.txt"), "w") as f:
                f.write("model,tensorsize_mb,skewness\n")
                f.write(f"{self.model_name},{tiresias:.1f},{skew:.1f}\n")
        except Exception as e:  # noqa: BLE001 — /result may be absent
            print(f"result copy write failed: {e}")

    def print_comparison_tables(self) -> None:
        """Reference-style comparison against external model constants."""
        tiresias = self.get_tiresias_tensorsize()
        skew = self.calculate_tensor_skewness()
        print("\n=== Tiresias TensorSize comparison (MB/iteration) ===")
        for model, size in REFERENCE_TENSORSIZE_MB.items():
            print(f"  {model:<12} {size:>8.1f}")
        print(f"  {self.model_name:<12} {tiresias:>8.1f}  <- measured")
        print("\n=== Skewness comparison ===")
        for model, s in REFERENCE_SKEWNESS.items():
            print(f"  {model:<12} {s:>8.1f}")
        print(f"  {self.model_name:<12} {skew:>8.1f}  <- measured")

    def close(self) -> None:
        for f in (self.tensor_log_file, self.memory_log_file,
                  self.summary_log_file, self.tiresias_log_file):
            try:
                f.close()
            except Exception:  # noqa: BLE001
                pass
        print("TensorProfiler closed")
