# BTS-TPU container image.
#
# Capability parity with the reference's Docker packaging
# (tensorflow/Dockerfile:1-51): a self-contained image with the compiled
# native op and the package on PYTHONPATH, ready to run inference/eval.
# TPU-native: based on a JAX TPU image instead of tensorflow-gpu; the
# native LPG CPU kernel is built with make (no CMake/CUDA needed).

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make \
    && rm -rf /var/lib/apt/lists/*

# For TPU VMs use: pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir \
        jax flax optax orbax-checkpoint chex numpy pillow tensorboardX \
        h5py scipy matplotlib pytest

WORKDIR /workspace/bts_tpu_repo
COPY bts_tpu ./bts_tpu
COPY native ./native
COPY configs ./configs
COPY tests ./tests
COPY bench.py README.md ./

# Build the native CPU LPG kernel.
RUN make -C native

ENV PYTHONPATH=/workspace/bts_tpu_repo

# Smoke test: op-level tests only (fast, no model compiles).
RUN python -m pytest tests/test_lpg.py tests/test_config.py -q

CMD ["python", "-m", "bts_tpu.cli.test", "configs/arguments_test_nyu.txt"]
