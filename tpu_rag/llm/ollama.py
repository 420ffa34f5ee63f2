"""Ollama HTTP backend.

Behavior parity with reference api/llm.py:71-145: /api/chat with messages,
auto-fallback to /api/generate (joined prompt) on HTTP 404, NDJSON line
streaming, options={temperature, num_predict}, 300 s timeout.
"""

from __future__ import annotations

import json
import logging
from typing import Iterator

import requests

from tpu_rag.llm.base import LLMBackend

logger = logging.getLogger(__name__)

TIMEOUT = 300


class OllamaBackend(LLMBackend):
    name = "ollama"

    def __init__(self, host: str, model: str, use_chat: bool = True) -> None:
        if not model:
            raise RuntimeError("OLLAMA_MODEL not set")
        self.host = host.rstrip("/")
        self.model = model
        self.use_chat = use_chat

    def _options(self, temperature: float, num_predict: int | None) -> dict:
        options: dict = {"temperature": temperature}
        if isinstance(num_predict, int) and num_predict > 0:
            options["num_predict"] = num_predict
        return options

    def _chat_payload(self, messages, stream, options) -> dict:
        return {"model": self.model, "messages": messages, "stream": stream,
                "options": options}

    def _generate_payload(self, messages, stream, options) -> dict:
        prompt = "\n".join(m.get("content", "") for m in messages)
        return {"model": self.model, "prompt": prompt, "stream": stream,
                "options": options}

    def complete(self, messages, *, temperature=0.7, max_tokens=None, num_predict=None) -> str:
        options = self._options(temperature, num_predict or max_tokens)
        if self.use_chat:
            try:
                r = requests.post(f"{self.host}/api/chat",
                                  json=self._chat_payload(messages, False, options),
                                  timeout=TIMEOUT)
                r.raise_for_status()
                data = r.json()
                return (data.get("message") or {}).get("content") or data.get("response", "")
            except requests.HTTPError as e:
                if getattr(e.response, "status_code", None) == 404:
                    logger.info("/api/chat not found, falling back to /api/generate")
                    self.use_chat = False
                else:
                    raise
        r = requests.post(f"{self.host}/api/generate",
                          json=self._generate_payload(messages, False, options),
                          timeout=TIMEOUT)
        r.raise_for_status()
        return r.json().get("response", "")

    def stream(self, messages, *, temperature=0.7, max_tokens=None, num_predict=None) -> Iterator[str]:
        options = self._options(temperature, num_predict or max_tokens)
        if self.use_chat:
            try:
                with requests.post(f"{self.host}/api/chat",
                                   json=self._chat_payload(messages, True, options),
                                   stream=True, timeout=TIMEOUT) as r:
                    r.raise_for_status()
                    for line in r.iter_lines():
                        if not line:
                            continue
                        data = json.loads(line.decode("utf-8"))
                        msg = (data.get("message") or {}).get("content") or data.get("response")
                        if msg:
                            yield msg
                    return
            except requests.HTTPError as e:
                if getattr(e.response, "status_code", None) == 404:
                    logger.info("/api/chat not found, falling back to /api/generate")
                    self.use_chat = False
                else:
                    raise
        with requests.post(f"{self.host}/api/generate",
                           json=self._generate_payload(messages, True, options),
                           stream=True, timeout=TIMEOUT) as r:
            r.raise_for_status()
            for line in r.iter_lines():
                if not line:
                    continue
                data = json.loads(line.decode("utf-8"))
                msg = data.get("response")
                if msg:
                    yield msg
