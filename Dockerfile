# Container packaging parity with the reference's Dockerfile:1-13
# (openjdk base -> pip requirements -> copy app -> gunicorn+uvicorn on
# :8000), adapted to this engine: Spark 4 needs Java 17 (the reference
# pinned openjdk:11 for delta-core 1.0), and there is no --packages
# warm-up step because the engine has no JVM extension jars — the
# versioned-table layer and its _delta_log mirror are pure PySpark.
#
# NOTE: authored-but-unbuilt — this build sandbox has no Docker daemon
# and no network. Syntax and entrypoint verified as far as the
# environment allows: the asgi module gates cleanly on fastapi, and
# `docker build` here would stop only at the network fetch steps.
FROM eclipse-temurin:17-jdk

ENV PYSPARK_PYTHON=python3
VOLUME /data
WORKDIR /app

# A venv sidesteps PEP 668 (the temurin base is Ubuntu noble, whose
# system python marks itself externally-managed and refuses bare
# `pip install`).
COPY requirements.txt requirements.txt
RUN apt-get update && \
    apt-get install -y --no-install-recommends python3 python3-venv && \
    rm -rf /var/lib/apt/lists/* && \
    python3 -m venv /opt/venv && \
    /opt/venv/bin/pip install --no-cache-dir -r requirements.txt
ENV PATH="/opt/venv/bin:$PATH"

COPY delta_lake_play_spark delta_lake_play_spark

# Same serving shape as the reference CMD (Dockerfile:13): gunicorn
# driving uvicorn workers; our routes run as sync `def` handlers in
# the framework threadpool (fixes the blocking-async flaw, see
# serving/app.py). ONE worker: each gunicorn worker would fork its
# own JVM-backed SparkSession; scale by threads, not processes.
CMD ["gunicorn", "--workers", "1", \
     "--worker-class", "uvicorn.workers.UvicornWorker", \
     "--bind", "0.0.0.0:8000", "--log-level", "info", \
     "delta_lake_play_spark.serving.asgi:app"]
