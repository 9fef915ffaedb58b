"""HTTP serving for the conversational audio agent.

API surface mirrors the reference Gradio event handlers
(``audio-chatgpt.py``): text turns (``run_text``:1197), audio/image upload
with auto-captioning into agent memory (``run_image_or_audio``:1250), the
speech loop ASR→agent→TTS (``speech``:1294), inpainting
(``inpainting``:1351), mode switch (``init_tools``:1075), and history clear.

Endpoints (JSON unless noted):
  GET  /              → chat UI (single-page HTML)
  GET  /health        → {"status": "ok", "tools": [...]}
  POST /mode          {"mode": "text"|"speech"} — rebuilds the toolset
  POST /chat          {"text": ...} → {response, steps, media}
  POST /upload        multipart or raw body w/ X-Filename — saves + ingests
  POST /speech        raw wav body → {transcript, response, audio}
  POST /inpaint/show  {"audio": rel} → {image, frames, mel_bins} — drawable
                      mel PNG (show_mel_fn:495)
  POST /inpaint       {"audio": rel, "mask": b64/dataURL PNG, "text"?,
                      "ddim_steps"?} → {audio} — sketch-mask regenerate
                      (inpainting:1351)
  POST /clear         → resets agent memory
  GET  /media/<kind>/<file> → served artifact (audio/image/video)

Media routing: each tool result whose tool's ``media_kind`` is audio/image/
video is surfaced in ``media`` with a ``/media/...`` URL — the equivalent of
``run_text`` branching on the tool name to pick a UI pane (1210-1248).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Mapping

from audiogpt_tpu.agent.agent import ConversationAgent
from audiogpt_tpu.agent.llm import LLMClient
from audiogpt_tpu.agent.toolset import build_toolset

_HTML_PATH = os.path.join(os.path.dirname(__file__), "webui.html")


class AppServer:
    """Holds the agent + engines; request handlers delegate here (the
    ``ConversationBot`` equivalent — state confined to one object, not
    globals)."""

    def __init__(self, llm: LLMClient, engines: Mapping[str, Any],
                 media_root: str = ".", mode: str = "text",
                 asr: Callable | None = None, tts: Callable | None = None,
                 max_steps: int = 6):
        self.llm = llm
        self.engines = dict(engines)
        self.media_root = os.path.abspath(media_root)
        for eng in self.engines.values():
            # engines that save their own artifacts (e.g. t2i) write into
            # the server's media root so /media/<rel> URLs resolve
            if hasattr(eng, "media_root"):
                eng.media_root = self.media_root
        self.max_steps = max_steps
        self._lock = threading.Lock()
        self.asr = asr
        self.tts = tts
        self.set_mode(mode)

    # -- bot operations ----------------------------------------------------
    def set_mode(self, mode: str) -> None:
        if mode not in ("text", "speech"):
            raise ValueError(f"mode must be text|speech, got {mode!r}")
        self.mode = mode
        self.tools = build_toolset(self.engines, root=self.media_root,
                                   mode=mode)
        self.agent = ConversationAgent(self.llm, self.tools,
                                       max_steps=self.max_steps)

    def _media_entry(self, tool_name: str, path: str) -> dict | None:
        kind = self.tools.get(tool_name).media_kind
        if kind not in ("audio", "image", "video"):
            return None
        rel = os.path.relpath(os.path.join(self.media_root, path),
                              self.media_root) if not os.path.isabs(path) \
            else os.path.relpath(path, self.media_root)
        return {"kind": kind, "url": f"/media/{rel}", "tool": tool_name}

    def chat(self, text: str) -> dict:
        with self._lock:
            result = self.agent.run_text(text)
        media = []
        for tool_name, _arg, obs in result.steps:
            if isinstance(obs, str) and os.path.exists(
                    os.path.join(self.media_root, obs)):
                entry = self._media_entry(tool_name, obs)
                if entry:
                    media.append(entry)
        return {"response": result.response,
                "steps": [{"tool": t, "input": a, "observation": str(o)}
                          for t, a, o in result.steps],
                "media": media}

    def upload(self, filename: str, data: bytes) -> dict:
        ext = os.path.splitext(filename)[1].lower() or ".bin"
        kind = "audio" if ext in (".wav", ".flac", ".mp3") else "image"
        os.makedirs(os.path.join(self.media_root, kind), exist_ok=True)
        rel = os.path.join(kind, f"{str(uuid.uuid4())[:8]}{ext}")
        with open(os.path.join(self.media_root, rel), "wb") as f:
            f.write(data)
        describe = None
        if kind == "audio" and "caption" in self.engines:
            def describe(p):
                from audiogpt_tpu.utils.audio_io import load_wav

                wav, _ = load_wav(os.path.join(self.media_root, p),
                                  sr=self.engines["caption"].sr)
                return self.engines["caption"].caption(wav)
        elif kind == "image" and "i2t" in self.engines:
            describe = self.engines["i2t"]
        desc = describe(rel) if describe else None
        with self._lock:
            # injects synthetic Human/AI turns (run_image_or_audio:1261-1264)
            self.agent.ingest_audio(rel, lambda _p: desc or
                                    ("an audio clip" if kind == "audio"
                                     else "an image"))
        return {"path": rel, "url": f"/media/{rel}", "kind": kind,
                "description": desc}

    def speech_turn(self, wav_bytes: bytes) -> dict:
        """ASR → agent → TTS of the response (reference ``speech``:1294)."""
        if self.asr is None or self.tts is None:
            raise RuntimeError("speech mode needs asr= and tts= callables")
        os.makedirs(os.path.join(self.media_root, "audio"), exist_ok=True)
        rel = os.path.join("audio", f"{str(uuid.uuid4())[:8]}.wav")
        full = os.path.join(self.media_root, rel)
        with open(full, "wb") as f:
            f.write(wav_bytes)
        from audiogpt_tpu.agent.tools import merge_audio

        with self._lock:
            transcript = self.asr(full)
            response, audio_path = self.agent.speech(
                full, lambda _p: transcript, self.tts,
                merge=lambda a, b: merge_audio(a, b, root=self.media_root))
        rel_audio = audio_path if not os.path.isabs(audio_path) \
            else os.path.relpath(audio_path, self.media_root)
        return {"transcript": transcript, "response": response,
                "audio": f"/media/{rel_audio}"}

    def inpaint_show(self, audio_rel: str) -> dict:
        """Render the clip's mel as a drawable PNG (``show_mel_fn``,
        audio-chatgpt.py:495-503)."""
        from audiogpt_tpu.serving.inpaint import (CROP_LEN, compute_mel,
                                                  render_mel_png)
        from audiogpt_tpu.utils.audio_io import load_wav

        eng = self.engines.get("t2a")
        if eng is None:
            raise RuntimeError("inpainting needs the 't2a' engine")
        wav, _ = load_wav(os.path.join(self.media_root, audio_rel),
                          sr=eng.cfg.sample_rate)
        mel = compute_mel(wav, eng.cfg)
        png = render_mel_png(mel)
        os.makedirs(os.path.join(self.media_root, "image"), exist_ok=True)
        rel = os.path.join("image", f"{str(uuid.uuid4())[:8]}.png")
        with open(os.path.join(self.media_root, rel), "wb") as f:
            f.write(png)
        return {"image": f"/media/{rel}", "path": rel,
                "frames": min(CROP_LEN, mel.shape[0]),  # rendered width
                "mel_bins": eng.cfg.mel_bins}

    def inpaint(self, audio_rel: str, mask_png: bytes, text: str = "",
                ddim_steps: int = 100) -> dict:
        """Sketch-drawn mask → regenerated audio (``inpainting``,
        audio-chatgpt.py:1351-1374). Drawn pixels (mask 1) are REGENERATED;
        the engine wants 1 = KEEP, so invert here."""
        import numpy as np

        from audiogpt_tpu.serving.inpaint import decode_mask_png
        from audiogpt_tpu.utils.audio_io import load_wav, save_wav

        eng = self.engines.get("t2a")
        if eng is None:
            raise RuntimeError("inpainting needs the 't2a' engine")
        wav, _ = load_wav(os.path.join(self.media_root, audio_rel),
                          sr=eng.cfg.sample_rate)
        regen = decode_mask_png(mask_png, mel_bins=eng.cfg.mel_bins)
        with self._lock:
            out = eng.inpaint(wav, 1.0 - regen, text=text,
                              ddim_steps=ddim_steps)
        os.makedirs(os.path.join(self.media_root, "audio"), exist_ok=True)
        rel = os.path.join("audio", f"{str(uuid.uuid4())[:8]}.wav")
        if out.ndim == 2 and out.shape[-1] == eng.cfg.mel_bins:
            # no vocoder attached: return the inpainted mel as an artifact
            from audiogpt_tpu.serving.inpaint import render_mel_png

            rel = os.path.join("image", f"{str(uuid.uuid4())[:8]}.png")
            os.makedirs(os.path.join(self.media_root, "image"), exist_ok=True)
            with open(os.path.join(self.media_root, rel), "wb") as f:
                f.write(render_mel_png(out, crop=out.shape[0]))
            return {"image": f"/media/{rel}", "path": rel}
        save_wav(np.asarray(out).ravel(),
                 os.path.join(self.media_root, rel), eng.cfg.sample_rate)
        return {"audio": f"/media/{rel}", "path": rel}

    def clear(self) -> None:
        with self._lock:
            self.agent.history = ""


class _Handler(BaseHTTPRequestHandler):
    app: AppServer  # injected by make_server

    def log_message(self, fmt, *args):  # quiet
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n)

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            with open(_HTML_PATH, "rb") as f:
                body = f.read()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/health":
            self._json({"status": "ok", "mode": self.app.mode,
                        "tools": self.app.tools.names()})
        elif self.path == "/stats":
            # per-tool RTF/latency counters (SURVEY.md §5: first-class
            # per-tool RTF metrics, replacing the reference's ad-hoc
            # profile_infer timers, vocoders/hifigan.py:59)
            from audiogpt_tpu.agent.tools import tool_stats_report

            self._json(tool_stats_report())
        elif self.path.startswith("/tts/stream"):
            self._tts_stream()
        elif self.path.startswith("/media/"):
            rel = os.path.normpath(self.path[len("/media/"):])
            full = os.path.join(self.app.media_root, rel)
            # path traversal guard
            if not full.startswith(self.app.media_root) or \
                    not os.path.isfile(full):
                self._json({"error": "not found"}, 404)
                return
            ctype = {"wav": "audio/wav", "png": "image/png",
                     "jpg": "image/jpeg", "mp4": "video/mp4"}.get(
                full.rsplit(".", 1)[-1], "application/octet-stream")
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(os.path.getsize(full)))
            self.end_headers()
            with open(full, "rb") as f:
                shutil.copyfileobj(f, self.wfile)
        else:
            self._json({"error": "not found"}, 404)

    def _tts_stream(self):
        """``GET /tts/stream?text=...`` → progressive WAV: the streaming
        header goes out immediately, then int16 PCM per synthesized clause
        chunk (``engines.tts.synthesize_stream``) — time-to-first-audio is
        one chunk's latency, not the whole utterance's. HTTP/1.0 close
        delimits the stream (no Content-Length)."""
        from urllib.parse import parse_qs, urlparse

        import numpy as np

        q = parse_qs(urlparse(self.path).query)
        text = (q.get("text") or [""])[0]
        # per-chunk phone cap: streaming defaults to ~one clause (64) so
        # TTFA is the first clause's latency, not the packed utterance's;
        # chunk_phones=0 restores greedy max-bucket packing
        try:
            chunk_phones = int((q.get("chunk_phones") or ["64"])[0]) or None
        except ValueError:
            chunk_phones = 64
        eng = self.app.engines.get("tts")
        if eng is None:
            self._json({"error": "tts engine not enabled"}, 404)
            return
        if not text.strip():
            self._json({"error": "missing text"}, 400)
            return
        from audiogpt_tpu.engines.tts import synthesize_stream
        from audiogpt_tpu.utils.audio_io import wav_stream_header

        # Pull the FIRST chunk before committing to a 200: the generator is
        # lazy, so frontend/bucket errors (e.g. an unsplittable token) would
        # otherwise surface after the header — a truncated HTTP-200 WAV the
        # client can't tell from success (ADVICE r3).
        gen = synthesize_stream(eng, text, max_phones=chunk_phones)
        try:
            first = next(gen)
        except StopIteration:
            self._json({"error": "empty synthesis"}, 400)
            return
        except Exception as e:
            self._json({"error": f"{type(e).__name__}: {e}"}, 500)
            return
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.end_headers()
        self.wfile.write(wav_stream_header(eng.sample_rate))
        self.wfile.flush()
        try:
            chunk = first
            while True:
                pcm = (np.clip(chunk, -1.0, 1.0) * 32767.0).astype("<i2")
                self.wfile.write(pcm.tobytes())
                self.wfile.flush()
                chunk = next(gen)
        except StopIteration:
            pass
        except (BrokenPipeError, ConnectionResetError):
            pass  # client went away mid-stream
        except Exception as e:
            # mid-stream engine failure: the 200 is already committed, so
            # log and close — EOF truncation is the only signal HTTP allows
            import sys

            print(f"| /tts/stream aborted: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    def do_POST(self):
        try:
            if self.path == "/chat":
                req = json.loads(self._read_body() or b"{}")
                if not req.get("text"):
                    self._json({"error": "missing 'text'"}, 400)
                    return
                self._json(self.app.chat(req["text"]))
            elif self.path == "/mode":
                req = json.loads(self._read_body() or b"{}")
                self.app.set_mode(req.get("mode", "text"))
                self._json({"mode": self.app.mode,
                            "tools": self.app.tools.names()})
            elif self.path == "/upload":
                filename = self.headers.get("X-Filename", "upload.bin")
                self._json(self.app.upload(filename, self._read_body()))
            elif self.path == "/speech":
                self._json(self.app.speech_turn(self._read_body()))
            elif self.path == "/inpaint/show":
                req = json.loads(self._read_body() or b"{}")
                if not req.get("audio"):
                    self._json({"error": "missing 'audio'"}, 400)
                    return
                self._json(self.app.inpaint_show(req["audio"]))
            elif self.path == "/inpaint":
                import base64

                req = json.loads(self._read_body() or b"{}")
                if not req.get("audio") or not req.get("mask"):
                    self._json({"error": "missing 'audio' or 'mask'"}, 400)
                    return
                mask_b64 = req["mask"].split(",", 1)[-1]  # allow data: URL
                self._json(self.app.inpaint(
                    req["audio"], base64.b64decode(mask_b64),
                    text=req.get("text", ""),
                    ddim_steps=int(req.get("ddim_steps", 100))))
            elif self.path == "/clear":
                self.app.clear()
                self._json({"status": "cleared"})
            else:
                self._json({"error": "not found"}, 404)
        except Exception as e:  # surface handler errors as JSON, not tracebacks
            self._json({"error": f"{type(e).__name__}: {e}"}, 500)


def make_server(app: AppServer, host: str = "127.0.0.1",
                port: int = 7860) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; call ``serve_forever()`` or use in
    a thread. Port 7860 = the reference's Gradio default."""
    handler = type("BoundHandler", (_Handler,), {"app": app})
    return ThreadingHTTPServer((host, port), handler)
