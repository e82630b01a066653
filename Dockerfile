# Reproducible test/bench environment for apd_map_reduce_spark —
# the role tema1a/Dockerfile (gcc:10.2 + checker) plays for the
# reference: a pinned toolchain anyone can rebuild to reproduce the
# correctness gate and the benchmark numbers.
#
# Build:  docker build -t apd-spark .
# Test:   docker run --rm apd-spark python -m pytest tests/ -q
# Bench:  docker run --rm -v /path/to/testdata:/testdata \
#           -e SPARK_GRAFT_SF_DIR=/testdata/sf0.1 apd-spark python bench.py
# Shell:  docker compose run engine    (interactive, like the reference's
#                                       apd_service entrypoint)
#
# Spark runs in local mode inside the container; JVM heap defaults are
# inherited from session.py (driver-memory sized for local[*] bench).
FROM python:3.11-slim-bookworm

# JDK 17 — the JVM Spark 4.x targets (matches the baseline machine).
RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless procps \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

WORKDIR /app
COPY requirements.lock .
RUN pip install --no-cache-dir -r requirements.lock

COPY apd_map_reduce_spark ./apd_map_reduce_spark
COPY scripts ./scripts
COPY tests ./tests
COPY examples ./examples
COPY bench.py __spark_entry__.py ./

# Default: run the unit suite (the reference image drops into the
# checker the same way).
CMD ["python", "-m", "pytest", "tests/", "-q"]
