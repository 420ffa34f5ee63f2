# TPU RAG API image.
# Counterpart of the reference Dockerfile (python-slim + uvicorn); here the
# server is first-party (tpu_rag/api/server.py) and JAX provides the compute.
# For TPU VMs, base this on a jax[tpu]-enabled image instead of python-slim.
FROM python:3.11-slim

WORKDIR /app

# CPU fallback works out of the box; install jax[tpu] on TPU hosts:
#   pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
COPY requirements.txt ./
RUN pip install --no-cache-dir -r requirements.txt

COPY tpu_rag ./tpu_rag
COPY scripts ./scripts
COPY web ./web
COPY bench.py __graft_entry__.py ./

# docs / vector_store / db are volumes (see docker-compose.yml)
ENV PERSIST_DIR=/app/vector_store \
    DOCS_DIR=/app/docs \
    KB_DB_PATH=/app/db/kb.sqlite3 \
    DB_PATH=/app/db/app.sqlite3 \
    HOST=0.0.0.0 \
    PORT=8000

EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s --retries=5 \
  CMD python -c "import urllib.request,sys; sys.exit(0 if urllib.request.urlopen('http://localhost:8000/health', timeout=4).status==200 else 1)"

CMD ["python", "scripts/serve.py"]
