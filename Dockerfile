# gorse_tpu node image (reference analog: cmd/gorse-in-one/Dockerfile and
# the per-node Dockerfiles under /root/reference/cmd/gorse-{master,server,worker}).
#
# One image serves every role; pick the entrypoint per service:
#   gorse-tpu-in-one | gorse-tpu-master | gorse-tpu-server | gorse-tpu-worker
#
# The TPU runtime (libtpu + jax[tpu]) is expected from the base image on TPU
# VMs; on CPU-only hosts the same image runs the service layer with jax[cpu].
ARG BASE_IMAGE=python:3.12-slim
FROM ${BASE_IMAGE}

WORKDIR /src

# native toolchain for the C++ components (HNSW index, fast data loader)
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

COPY pyproject.toml ./
COPY gorse_tpu ./gorse_tpu

# jax is intentionally not pinned here: TPU VMs install jax[tpu] against
# their libtpu; CI/dev installs jax[cpu]
RUN pip install --no-cache-dir "jax" "numpy" "jinja2" \
    && pip install --no-cache-dir --no-build-isolation --no-deps .

RUN mkdir -p /var/lib/gorse /var/log/gorse /etc/gorse
ENV GORSE_BLOB_URI=/var/lib/gorse/blob

EXPOSE 8086 8087 8088 8089

ENTRYPOINT ["gorse-tpu-in-one", "--config", "/etc/gorse/config.toml"]
