#!/bin/sh
# Start ollama, wait for it, and create the custom models from /modelfiles
# (parity with reference ollama/init-ollama.sh:1-19).
set -e

ollama serve &
PID=$!

until ollama list >/dev/null 2>&1; do
  echo "waiting for ollama..."
  sleep 1
done

if ! ollama list | grep -q "llama3:8b"; then
  ollama pull llama3:8b || true
fi
if ! ollama list | grep -q "llama3-8b-8k"; then
  [ -f /modelfiles/llama3-8b-8k.Modelfile ] && \
    ollama create llama3-8b-8k -f /modelfiles/llama3-8b-8k.Modelfile || true
fi

wait $PID
