# tethys-tpu job image — TPU-native equivalent of the reference Dockerfile
# (reference /Dockerfile: nvcr TF 22.12 base + tcpdump/net-tools/transformers/
# librosa).  Built on the public JAX TPU stack instead of the NVIDIA TF base;
# the same side-capture tools (tcpdump, net-tools, procps for `top`) are kept
# because the JobSet manifests use them.

FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        tcpdump \
        net-tools \
        procps \
        build-essential \
        && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex einops numpy scipy psutil \
        transformers librosa soundfile

WORKDIR /workspace
COPY tethys_tpu /workspace/tethys_tpu
COPY jobs /workspace/jobs
COPY scripts/job_name.py /workspace/job_name.py
COPY scripts/tpu.sh /workspace/tpu.sh
COPY scripts/tpu.sh /workspace/gpu.sh
COPY scripts/network.sh /workspace/network.sh

# Build the native chip-monitor daemon (NVML-daemon equivalent).
RUN make -C /workspace/tethys_tpu/monitor && \
    mkdir -p /workspace/monitor && \
    cp /workspace/tethys_tpu/monitor/tpu_monitor /workspace/monitor/tpu_monitor

ENV PYTHONPATH=/workspace
ENV JAX_COMPILATION_CACHE_DIR=/workspace/.jax_cache

CMD ["python", "jobs/whisper_dist.py", "--batch_size", "4", "--num_batches", "30"]
