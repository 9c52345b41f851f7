# Container image for the blt CLI (reference: Dockerfile, 2-stage build with
# ENTRYPOINT blt-tokenize). Python needs no build stage; the optional native
# host engine is compiled in-image.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY blt_tpu ./blt_tpu
RUN pip install --no-cache-dir . && python -m blt_tpu.native.build

ENTRYPOINT ["blt"]
