"""Endpoint-backed worker: the sglang_worker analogue
(reference serve/sglang_worker.py) — speaks the same worker protocol but
forwards generation to an external OpenAI-compatible chat endpoint instead
of hosting weights (useful for A/B-ing the TPU worker against any hosted
backend)."""
from __future__ import annotations

import argparse
import json
import urllib.request

from ..utils.logging import build_logger
from .model_worker import ModelWorker, make_handler, serve_worker

logger = build_logger("endpoint_worker", "endpoint_worker.log")


class EndpointWorker(ModelWorker):
    def __init__(self, controller_addr, worker_addr, endpoint_url,
                 endpoint_model, model_name=None, api_key="",
                 limit_model_concurrency=5, no_register=False):
        self.endpoint_url = endpoint_url.rstrip("/")
        self.endpoint_model = endpoint_model
        self.api_key = api_key
        # bypass ModelWorker's model loading entirely
        self.worker_id = "ep"
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.model_name = model_name or f"endpoint:{endpoint_model}"
        import threading

        self.semaphore = threading.Semaphore(limit_model_concurrency)
        self.limit = limit_model_concurrency
        self._active = 0
        self._waiting = 0
        self._sessions = {}
        self._sessions_lock = threading.Lock()
        self.model = None
        self.tokenizer = None
        self.processor = None
        self.version = "llama_2"
        if not no_register:
            self.register_to_controller()
            threading.Thread(target=self._heartbeat_loop, daemon=True).start()

    def generate_stream(self, params: dict):
        prompt = params["prompt"]
        body = {
            "model": self.endpoint_model,
            "messages": [{"role": "user", "content": prompt}],
            "max_tokens": int(params.get("max_new_tokens", 256)),
            "temperature": float(params.get("temperature", 0.0)),
            "stream": True,
        }
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            self.endpoint_url + "/v1/chat/completions",
            data=json.dumps(body).encode(), headers=headers,
        )
        text = ""
        with urllib.request.urlopen(req, timeout=300) as resp:
            for raw in resp:
                line = raw.decode().strip()
                if not line.startswith("data:"):
                    continue
                payload = line[5:].strip()
                if payload == "[DONE]":
                    break
                choices = json.loads(payload).get("choices") or []
                # content-filter/preamble chunks carry empty choices
                delta = choices[0].get("delta", {}).get("content") if choices else None
                if delta:
                    text += delta
                    yield json.dumps({"text": text, "error_code": 0}).encode() + b"\0"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=21003)
    parser.add_argument("--controller-address", default="http://localhost:10000")
    parser.add_argument("--worker-address", default="http://localhost:21003")
    parser.add_argument("--endpoint-url", required=True)
    parser.add_argument("--endpoint-model", required=True)
    parser.add_argument("--api-key", default="")
    parser.add_argument("--no-register", action="store_true")
    args = parser.parse_args()
    worker = EndpointWorker(
        args.controller_address, args.worker_address, args.endpoint_url,
        args.endpoint_model, api_key=args.api_key, no_register=args.no_register,
    )
    server = serve_worker(worker, args.host, args.port)
    logger.info(f"endpoint worker on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
