"""Browser chat UI — the gradio_web_server role (reference
serve/gradio_web_server.py) on the standard library: one HTML page with
fetch-streaming JS, served next to a JSON proxy to the controller.

  python -m streammind_tpu.serve.web_server --controller-url http://...:10000

Adhoc mode — the gradio_web_server_adhoc role (reference
serve/gradio_web_server_adhoc.py:77-133: in-process Chat wrapper, no
controller/worker): pass --model-path to load the model in this process and
serve the same UI straight off it.

  python -m streammind_tpu.serve.web_server --model-path /path/to/ckpt
"""
from __future__ import annotations

import argparse
import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..utils.logging import build_logger
from .controller import http_post_json

logger = build_logger("web_server", "web_server.log")

_PAGE = """<!DOCTYPE html>
<html><head><title>StreamMind-TPU</title>
<style>
 body { font-family: sans-serif; max-width: 760px; margin: 2em auto; }
 #log { border: 1px solid #ccc; padding: 1em; min-height: 280px; white-space: pre-wrap; }
 textarea, input, select, button { font-size: 1em; margin: 0.2em 0; }
 textarea { width: 100%; height: 4em; }
</style></head>
<body>
<h2>StreamMind-TPU</h2>
<div>model: <select id="model"></select>
 temperature <input id="temp" type="number" value="0.2" step="0.1" style="width:4em">
 max tokens <input id="maxtok" type="number" value="256" style="width:5em"></div>
<div>video path (server-side): <input id="video" style="width:60%"></div>
<div id="log"></div>
<textarea id="msg" placeholder="Ask about the video..."></textarea>
<button onclick="send()">Send</button>
<button onclick="vote('upvote')">&#128077;</button>
<button onclick="vote('downvote')">&#128078;</button>
<script>
async function vote(kind) {
  await fetch('/api/vote', {method:'POST', body: JSON.stringify({
    type: kind, model: document.getElementById('model').value,
    history: history})});
}
async function refresh() {
  const r = await fetch('/api/list_models', {method:'POST'});
  const d = await r.json();
  const sel = document.getElementById('model');
  sel.innerHTML = '';
  for (const m of d.models) { const o = document.createElement('option'); o.text = m; sel.add(o); }
}
let history = [];
async function send() {
  const msg = document.getElementById('msg').value;
  const log = document.getElementById('log');
  history.push(['USER', msg]);
  log.textContent += 'USER: ' + msg + '\\n';
  const payload = {
    model: document.getElementById('model').value,
    prompt: buildPrompt(),
    video_path: document.getElementById('video').value,
    temperature: parseFloat(document.getElementById('temp').value),
    max_new_tokens: parseInt(document.getElementById('maxtok').value),
  };
  const resp = await fetch('/api/generate', {method:'POST', body: JSON.stringify(payload)});
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = '', text = '';
  log.textContent += 'ASSISTANT: ';
  const base = log.textContent;
  while (true) {
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream: true});
    const parts = buf.split('\\u0000');
    buf = parts.pop();
    for (const p of parts) {
      if (!p) continue;
      const d = JSON.parse(p);
      text = d.text;
      log.textContent = base + text;
    }
  }
  history.push(['ASSISTANT', text]);
  log.textContent += '\\n';
  document.getElementById('msg').value = '';
}
function buildPrompt() {
  const sys = "A chat between a curious user and an artificial intelligence assistant. " +
    "The assistant gives helpful, detailed, and polite answers to the user's questions.";
  let out = '';
  for (let i = 0; i < history.length; i++) {
    const [role, m] = history[i];
    if (role === 'USER') {
      let text = m;
      if (i === 0) text = "<<SYS>>\\n" + sys + "\\n<</SYS>>\\n\\n<video>\\n" + text;
      out += "[INST] " + text + " [/INST]";
    } else { out += ' ' + m + ' </s>'; }
  }
  return out;
}
refresh();
</script></body></html>
"""


def make_handler(controller_url=None, worker=None):
    """controller_url → proxy mode (controller + workers); worker → adhoc
    in-process mode (the reference's gradio_web_server_adhoc role)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.info("%s - %s" % (self.address_string(), fmt % args))

        def do_GET(self):  # noqa: N802
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, out: dict):
            body = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        # Per-path request-body caps, enforced BEFORE buffering — this is an
        # unauthenticated server.  /api/generate legitimately carries
        # base64 video; everything else is small JSON.
        BODY_CAPS = {"/api/generate": 512 * 1024 * 1024}
        DEFAULT_BODY_CAP = 64 * 1024

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            # cap lookup ignores any query string (/api/generate?session=x
            # must get the video-payload cap, not the 64 KB default)
            route = self.path.split("?", 1)[0]
            if length > self.BODY_CAPS.get(route, self.DEFAULT_BODY_CAP):
                body = json.dumps({"ok": False, "error": "payload too large"}).encode()
                self.send_response(413)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Connection", "close")
                self.end_headers()
                self.wfile.write(body)
                return
            data = json.loads(self.rfile.read(length) or b"{}")
            if self.path == "/api/list_models":
                if worker is not None:
                    self._json({"models": [worker.model_name]})
                else:
                    self._json(http_post_json(controller_url + "/list_models", {}))
            elif self.path == "/api/vote":
                # vote logging (reference gradio_web_server.py upvote/
                # downvote handlers): JSONL next to the server logs.
                # Bounded + dict-only: this is an unauthenticated endpoint.
                import os
                import time as _time

                if not isinstance(data, dict):
                    self._json({"ok": False, "error": "bad vote payload"})
                    return
                from ..constants import LOGDIR  # same dir as the server logs

                os.makedirs(LOGDIR, exist_ok=True)
                with open(os.path.join(LOGDIR, "votes.jsonl"), "a") as f:
                    f.write(json.dumps({"tstamp": _time.time(), **data}) + "\n")
                self._json({"ok": True})
            elif self.path == "/api/generate":
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                if worker is not None:
                    for chunk in worker.generate_stream_gate(data):
                        self.wfile.write(chunk)
                        self.wfile.flush()
                    return
                req = urllib.request.Request(
                    controller_url + "/worker_generate_stream",
                    data=json.dumps(data).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=300) as resp:
                    while True:
                        chunk = resp.read(256)
                        if not chunk:
                            break
                        self.wfile.write(chunk)
                        self.wfile.flush()
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--controller-url", default="http://localhost:10000")
    parser.add_argument("--model-path", default=None,
                        help="adhoc mode: load the model in-process and serve "
                             "it directly (no controller/worker needed)")
    args = parser.parse_args()
    if args.model_path:
        from .model_worker import ModelWorker

        worker = ModelWorker(
            controller_addr="", worker_addr="", model_path=args.model_path,
            no_register=True,
        )
        handler = make_handler(worker=worker)
        logger.info(f"adhoc web ui (in-process model) on http://{args.host}:{args.port}")
    else:
        handler = make_handler(controller_url=args.controller_url)
        logger.info(f"web ui on http://{args.host}:{args.port}")
    server = ThreadingHTTPServer((args.host, args.port), handler)
    server.serve_forever()


if __name__ == "__main__":
    main()
