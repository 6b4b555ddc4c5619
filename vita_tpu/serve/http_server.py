"""HTTP serving demo: chat + streaming over the continuous-batching engine.

The TPU-side equivalent of the reference's gradio ability demo
(web_demo/web_ability_demo.py:132-243,338-355) without the gradio/vLLM
dependencies: a stdlib ThreadingHTTPServer exposing

  GET  /            — minimal chat page (text + image/audio upload)
  GET  /health      — {"status": "ok", "active": N}
  GET  /stats       — serving metrics (p50 TTFT, decode tok/s, queue depth)
  POST /v1/generate — {"prompt": str, "image_b64"?: str, "audio_b64"?: str,
                       "max_tokens"?: int, "temperature"?: float}
                      -> chunked text/plain token stream

Launch: python -m vita_tpu.serve.http_server --model tiny-random --port 8800
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from vita_tpu.tokenization import audio_token_count, media_masks

_PAGE = """<!doctype html><title>VITA-TPU demo</title>
<style>body{font-family:sans-serif;max-width:720px;margin:2em auto}
#log{white-space:pre-wrap;border:1px solid #ccc;padding:1em;min-height:8em}</style>
<h2>VITA-TPU chat</h2><div id=log></div>
<input id=q style="width:70%" placeholder="ask something">
<input type=file id=img accept="image/*"><button onclick=send()>Send</button>
<script>
async function send(){
 const q=document.getElementById('q').value;
 const body={prompt:q,max_tokens:128};
 const f=document.getElementById('img').files[0];
 if(f){body.image_b64=await new Promise(r=>{const fr=new FileReader();
   fr.onload=()=>r(fr.result.split(',')[1]);fr.readAsDataURL(f);});}
 const log=document.getElementById('log');log.textContent+='\\n> '+q+'\\n';
 const res=await fetch('/v1/generate',{method:'POST',body:JSON.stringify(body)});
 const rd=res.body.getReader();const dec=new TextDecoder();
 for(;;){const{done,value}=await rd.read();if(done)break;
   log.textContent+=dec.decode(value);}
}
</script>"""


class ServingApp:
    """Holds the engine, tokenizer, and preprocessing for the handlers."""

    def __init__(self, engine, cfg, encode, decode, bos_id, eos_id, image_size=448):
        from vita_tpu.serve.engine import EngineThread

        self.engine = engine
        self.cfg = cfg
        self.encode, self.decode = encode, decode
        self.bos_id, self.eos_id = bos_id, eos_id
        self.image_size = image_size
        self.thread = EngineThread(engine)
        self.thread.start()

    def build_request(self, payload: dict):
        from vita_tpu.conversation import TEMPLATES, Dialog
        from vita_tpu.serve.engine import Request
        from vita_tpu.tokenization import expand_media_sentinels, tokenize_multimodal

        prompt_text = payload.get("prompt", "")
        images = speech = None
        speech_len = 0
        img_counts, aud_counts = [], []
        parts = []

        if payload.get("image_b64"):
            from PIL import Image

            from vita_tpu.data.image import dynamic_tile, normalize

            raw = base64.b64decode(payload["image_b64"])
            arr = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
            if self.image_size < 448:  # tiny model: single resized tile
                from PIL import Image as I

                tiles = [np.asarray(I.fromarray(arr).resize((self.image_size,) * 2))]
            else:
                tiles = dynamic_tile(arr, 1, 12, self.image_size, True)
            images = normalize(tiles)
            img_counts = [len(tiles) * self.cfg.vision.out_tokens]
            parts.append("<image>")
        if payload.get("audio_b64"):
            from vita_tpu.data.audio import fbank

            raw = np.frombuffer(base64.b64decode(payload["audio_b64"]), np.int16)
            speech = fbank(raw.astype(np.float32) / 32768.0)
            speech_len = len(speech)
            aud_counts = [audio_token_count(speech_len)]
            parts.append("<audio>")
        if prompt_text and not payload.get("audio_b64"):
            parts.append(prompt_text)

        modality = "image" if images is not None else "lang"
        d = Dialog(TEMPLATES["mixtral_two"]).user("\n".join(parts)).assistant()
        ids = tokenize_multimodal(d.render(modality), self.encode, bos_id=self.bos_id)
        expanded = expand_media_sentinels(ids, img_counts, aud_counts)
        safe, im, am = media_masks(np.array(expanded))

        return Request(
            input_ids=safe,
            image_mask=im if images is not None else None,
            audio_mask=am if speech is not None else None,
            images=images, speech=speech, speech_length=speech_len,
            max_new_tokens=int(payload.get("max_tokens", 256)),
            temperature=float(payload.get("temperature", 0.0)),
            eos_id=self.eos_id,
        )


def make_handler(app: ServingApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/stats":
                body = json.dumps(app.engine.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/health":
                body = json.dumps(
                    {"status": "ok", "active": app.engine.active_count()}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/v1/generate":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                req = app.build_request(payload)
                tok_q: "queue.Queue[Optional[int]]" = queue.Queue()
                req.on_token = tok_q.put
                req.on_finish = lambda toks, reason: tok_q.put(None)
                app.engine.submit(req)  # may reject on cache capacity
            except Exception as e:  # malformed request / over capacity
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return

            self.send_response(200)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            sent = ""
            toks = []
            try:
                while True:
                    t = tok_q.get()
                    if t is None:
                        break
                    toks.append(t)
                    text = app.decode(toks).replace("</s>", "")
                    for st in ("<1>", "<2>", "<3>"):
                        text = text.replace(st, "")
                    if len(text) > len(sent):
                        chunk = text[len(sent):].encode()
                        self.wfile.write(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
                        sent = text
                self.wfile.write(b"0\r\n\r\n")
            except (BrokenPipeError, ConnectionResetError):
                req.cancel()  # client went away: free the slot

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--port", type=int, default=8800)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--max-len", type=int, default=4096)
    args = p.parse_args(argv)

    import jax

    from vita_tpu.models import vita
    from vita_tpu.serve.engine import Engine

    if args.model == "tiny-random":
        cfg = vita.VITAConfig.tiny()
        params = vita.init_params(jax.random.PRNGKey(0), cfg)
        from vita_tpu.cli import ByteTokenizer

        tok = ByteTokenizer()
        encode, decode = tok.encode, tok.decode
        bos_id, eos_id = tok.bos_id, tok.eos_id
    else:
        from vita_tpu.checkpoint import load_vita_checkpoint
        from vita_tpu.cli import load_hf_tokenizer

        cfg, params = load_vita_checkpoint(args.model)
        hf_tok = load_hf_tokenizer(args.model)
        encode = lambda s: hf_tok(s).input_ids
        decode = lambda ids: hf_tok.decode(ids, skip_special_tokens=False)
        bos_id, eos_id = hf_tok.bos_token_id, hf_tok.eos_token_id

    engine = Engine(params, cfg, n_slots=args.slots, max_len=args.max_len)
    app = ServingApp(engine, cfg, encode, decode, bos_id, eos_id,
                     image_size=cfg.vision.image_size)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(app))
    print(f"[serve] listening on http://{args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
