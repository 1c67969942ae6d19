# Container entry point (reference ships a Dockerfile whose CMD starts
# the web app).  On TPU VMs prefer a host install with the libtpu-bundled
# jax; this image covers CPU serving and the web UI.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY rvc_maker_tpu ./rvc_maker_tpu
COPY native ./native

RUN pip install --no-cache-dir "jax[cpu]" flax optax orbax-checkpoint \
        chex einops numpy scipy && \
    pip install --no-cache-dir -e . && \
    make -C native

EXPOSE 7865
CMD ["python", "-m", "rvc_maker_tpu.app.server", "--port", "7865"]
