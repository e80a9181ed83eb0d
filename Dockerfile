# Single-node deployment image.
#
# The reference ships an all-in-one docker-compose of seven services
# (zookeeper/kafka or kinesalite, HBase, pushers, processors, the API;
# reference: setup/all-in-one/*.yml). This framework embeds the bus and the
# table store, so the whole stack is one container per role:
#
#   docker run ... run_processing   # ingest + extraction
#   docker run ... run_search_api   # index + REST serving
#
# Base image must provide jax with the TPU runtime for your platform
# (e.g. a cloud TPU base image); for CPU smoke tests any jax image works.
ARG BASE_IMAGE=python:3.12-slim
FROM ${BASE_IMAGE}

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libjpeg-dev libpng-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY columbiaimagesearch_tpu/ columbiaimagesearch_tpu/
COPY native/ native/
COPY scripts/ scripts/
COPY conf/ conf/

# Pre-build the native host runtime.
RUN make -C native

ENV PYTHONPATH=/app
VOLUME ["/data"]
EXPOSE 5000

# Default: serve the search API; override CMD for the processing role.
CMD ["python", "scripts/run_search_api.py", \
     "-c", "conf/conf_search_local.json", "-p", "5000"]
