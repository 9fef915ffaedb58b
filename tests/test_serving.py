"""Serving layer tests: run the HTTP server in-thread, exercise every
endpoint with a scripted LLM + a tiny real engine."""

import json
import threading
import urllib.parse
import urllib.request

import numpy as np
import pytest

from audiogpt_tpu.agent.llm import ScriptedLLM
from audiogpt_tpu.serving import AppServer, make_server
from audiogpt_tpu.utils.audio_io import save_wav


def _req(port, path, data=None, headers=None, method=None):
    url = f"http://127.0.0.1:{port}{path}"
    req = urllib.request.Request(url, data=data, headers=headers or {},
                                 method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.read(), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from audiogpt_tpu.engines.transform import SeparationEngine
    from audiogpt_tpu.models.separation.convtasnet import ConvTasNetConfig

    root = str(tmp_path_factory.mktemp("media"))
    engines = {
        "enhance": SeparationEngine(ConvTasNetConfig(
            n_src=1, enc_dim=32, bottleneck=8, hidden=16, skip=8,
            n_blocks=2, n_repeats=1)),
    }
    src = f"{root}/noisy.wav"
    sr = 16000
    t = np.arange(sr) / sr
    save_wav((0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), src, sr)

    llm = ScriptedLLM([
        "Thought: Do I need to use a tool? Yes\n"
        f"Action: Speech Enhancement In Single-Channel\nAction Input: {src}",
        "Thought: Do I need to use a tool? No\nAI: Enhanced audio ready.",
        # second conversation turn: direct answer
        "Thought: Do I need to use a tool? No\nAI: You are welcome!",
    ])
    app = AppServer(llm, engines, media_root=root)
    httpd = make_server(app, port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield port, app, src
    httpd.shutdown()


def test_health_and_ui(server):
    port, app, _ = server
    code, body, _ = _req(port, "/health")
    assert code == 200
    data = json.loads(body)
    assert data["status"] == "ok" and data["mode"] == "text"
    assert "Speech Enhancement In Single-Channel" in data["tools"]

    code, body, headers = _req(port, "/")
    assert code == 200 and b"AudioGPT-TPU" in body
    assert "text/html" in headers["Content-Type"]


def test_chat_tool_turn_and_media(server):
    port, app, src = server
    code, body, _ = _req(
        port, "/chat", json.dumps({"text": "enhance " + src}).encode(),
        {"Content-Type": "application/json"})
    assert code == 200
    data = json.loads(body)
    assert data["response"] == "Enhanced audio ready."
    assert data["steps"][0]["tool"] == "Speech Enhancement In Single-Channel"
    assert data["media"] and data["media"][0]["kind"] == "audio"

    # the media URL must actually serve the wav
    code, wav, headers = _req(port, data["media"][0]["url"])
    assert code == 200 and headers["Content-Type"] == "audio/wav"
    assert len(wav) > 1000

    # second turn: direct answer, no media
    code, body, _ = _req(
        port, "/chat", json.dumps({"text": "thanks"}).encode(),
        {"Content-Type": "application/json"})
    data = json.loads(body)
    assert data["response"] == "You are welcome!" and not data["media"]


def test_chat_missing_text(server):
    port, _, _ = server
    code, body, _ = _req(port, "/chat", b"{}",
                         {"Content-Type": "application/json"})
    assert code == 400


def test_media_traversal_guard(server):
    port, _, _ = server
    code, _, _ = _req(port, "/media/../../../etc/passwd")
    assert code == 404


def test_upload_and_clear(server):
    port, app, _ = server
    sr = 16000
    import io
    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, sr, np.zeros(sr, np.int16))
    code, body, _ = _req(port, "/upload", buf.getvalue(),
                         {"X-Filename": "clip.wav"})
    assert code == 200
    data = json.loads(body)
    assert data["kind"] == "audio"
    assert "provide a new audio file" in app.agent.history

    code, _, _ = _req(port, "/clear", b"", method="POST")
    assert code == 200 and app.agent.history == ""


def test_mode_switch(server):
    port, app, _ = server
    code, body, _ = _req(port, "/mode", json.dumps({"mode": "speech"}).encode(),
                         {"Content-Type": "application/json"})
    assert code == 200 and json.loads(body)["mode"] == "speech"
    # enhancement is a text-mode-only tool (audio-chatgpt.py:1153+)
    assert "Speech Enhancement In Single-Channel" not in app.tools.names()
    _req(port, "/mode", json.dumps({"mode": "text"}).encode(),
         {"Content-Type": "application/json"})

    code, body, _ = _req(port, "/mode", json.dumps({"mode": "bogus"}).encode(),
                         {"Content-Type": "application/json"})
    assert code == 500 and b"ValueError" in body


def test_speech_endpoint(tmp_path):
    """ASR→agent→TTS loop over HTTP (reference `speech`, 1294)."""
    import io
    import threading
    from scipy.io import wavfile

    from audiogpt_tpu.agent.llm import ScriptedLLM
    from audiogpt_tpu.serving import AppServer, make_server

    root = str(tmp_path)

    def fake_asr(path):
        return "what is the weather"

    def fake_tts(text):
        out = f"{root}/audio/tts_out.wav"
        import os

        os.makedirs(f"{root}/audio", exist_ok=True)
        save_wav(np.zeros(8000, np.float32), out, 16000)
        return out

    llm = ScriptedLLM([
        "Thought: Do I need to use a tool? No\nAI: Sunny, probably."])
    app = AppServer(llm, {}, media_root=root, asr=fake_asr, tts=fake_tts,
                    mode="speech")
    httpd = make_server(app, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        buf = io.BytesIO()
        wavfile.write(buf, 16000, np.zeros(16000, np.int16))
        code, body, _ = _req(port, "/speech", buf.getvalue())
        assert code == 200
        data = json.loads(body)
        assert data["transcript"] == "what is the weather"
        assert data["response"] == "Sunny, probably."
        assert data["audio"].startswith("/media/")
        code, wav_bytes, _ = _req(port, data["audio"])
        assert code == 200 and len(wav_bytes) > 1000
    finally:
        httpd.shutdown()


def test_concurrent_chat_requests(tmp_path):
    """ThreadingHTTPServer + the agent lock must serialize tool turns without
    dropping or interleaving conversations."""
    import concurrent.futures
    import threading

    from audiogpt_tpu.agent.llm import ScriptedLLM
    from audiogpt_tpu.serving import AppServer, make_server

    llm = ScriptedLLM([
        f"Thought: Do I need to use a tool? No\nAI: answer-{i}"
        for i in range(8)
    ])
    app = AppServer(llm, {}, media_root=str(tmp_path))
    httpd = make_server(app, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def ask(i):
            code, body, _ = _req(
                port, "/chat", json.dumps({"text": f"q{i}"}).encode(),
                {"Content-Type": "application/json"})
            return code, json.loads(body)["response"]

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(ask, range(8)))
        assert all(code == 200 for code, _ in results)
        # every scripted answer delivered exactly once
        answers = sorted(r for _, r in results)
        assert answers == sorted(f"answer-{i}" for i in range(8))
    finally:
        httpd.shutdown()


def test_stats_endpoint_reports_tool_rtf(server):
    """/stats exposes per-tool RTF/latency counters (SURVEY.md §5: per-tool
    RTF as first-class metrics). Runs after the chat tests above drove the
    enhancement tool through the agent."""
    port, app, _ = server
    code, body, _ = _req(port, "/stats")
    assert code == 200
    stats = json.loads(body)
    key = "Speech Enhancement In Single-Channel"
    assert key in stats
    row = stats[key]
    assert row["calls"] >= 1 and row["wall_s"] > 0
    assert row["audio_s"] > 0 and row["rtf"] is not None
    assert "mean_latency_s" in row


def test_load_engine_ckpts_roundtrip(tmp_path):
    """serve --ckpt ENGINE=DIR: orbax params land in the engine and change
    its output."""
    import jax

    from audiogpt_tpu.app import load_engine_ckpts
    from audiogpt_tpu.engines.transform import SeparationEngine
    from audiogpt_tpu.import_ckpt import save_params
    from audiogpt_tpu.models.separation.convtasnet import ConvTasNetConfig

    eng = SeparationEngine(ConvTasNetConfig(
        n_src=1, enc_dim=32, bottleneck=8, hidden=16, skip=8,
        n_blocks=2, n_repeats=1))
    perturbed = jax.tree.map(lambda a: a + 0.01, eng.params)
    path = tmp_path / "ck"
    save_params(perturbed, str(path))

    load_engine_ckpts({"enhance": eng}, [f"enhance={path}"])
    leaf = jax.tree.leaves(eng.params)[0]
    leaf2 = jax.tree.leaves(perturbed)[0]
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(leaf2))

    import pytest
    with pytest.raises(SystemExit):
        load_engine_ckpts({"enhance": eng}, [f"tts={path}"])


def _tiny_tts_engine(token_buckets=(32,)):
    """Small FS2+HiFiGAN so fused-program compiles are seconds, not minutes,
    on the 1-core CPU test host (the default-size engine's cold batch-4
    compile exceeded the 60 s client timeout — VERDICT r3 weak #1)."""
    from audiogpt_tpu.engines.tts import TTSEngine
    from audiogpt_tpu.engines.vocoder import VocoderEngine
    from audiogpt_tpu.models.tts import FastSpeech2Config
    from audiogpt_tpu.models.vocoder import HifiGANConfig

    voc = VocoderEngine(
        "hifigan",
        HifiGANConfig(upsample_initial_channel=32, resblock_kernel_sizes=(3,),
                      resblock_dilation_sizes=((1, 3),)),
        buckets=(64, 128))
    return TTSEngine(
        cfg=FastSpeech2Config(vocab_size=128, hidden_size=32, enc_layers=1,
                              dec_layers=1, predictor_layers=2,
                              max_frames=128),
        vocoder=voc, token_buckets=token_buckets)


def test_microbatched_tts_server(tmp_path):
    """End-to-end: an AppServer whose TTS engine is wrapped in BatchedTTS
    (the `serve --microbatch` path) answers concurrent /chat tool turns and
    the batcher actually carries the traffic."""
    from audiogpt_tpu.serving.batcher import BatchedTTS

    root = str(tmp_path)
    proxy = BatchedTTS(_tiny_tts_engine(), window_ms=20.0)
    engines = {"tts": proxy}
    n = 3
    llm = ScriptedLLM(
        ["Thought: Do I need to use a tool? Yes\n"
         "Action: Synthesize Speech Given the User Input Text\n"
         "Action Input: microbatched hello",
         "Thought: Do I need to use a tool? No\nAI: spoken."] * n)
    app = AppServer(llm, engines, media_root=root)
    httpd = make_server(app, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        results = [None] * n

        def chat(i):
            body = json.dumps({"text": f"say hi {i}"}).encode()
            results[i] = _req(port, "/chat", body,
                              {"Content-Type": "application/json"})

        threads = [threading.Thread(target=chat, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, raw, _ in results:
            assert status == 200
            out = json.loads(raw)
            assert out["steps"], out
        assert proxy.batcher.items == n   # every turn went through batching
    finally:
        httpd.shutdown()
        proxy.batcher.close()


def test_microbatch_coalesces_across_sessions(tmp_path):
    """The documented micro-batching deployment shape: multiple AppServer
    sessions share one BatchedTTS — concurrent tool turns from DIFFERENT
    conversations coalesce into fewer device batches (within one
    conversation the agent turn is serialized, so sharing is where the
    batching win lives)."""
    from audiogpt_tpu.serving.batcher import BatchedTTS

    proxy = BatchedTTS(_tiny_tts_engine(), max_batch=4, window_ms=150.0)
    # AOT-warm every dyadic batch rung this batcher can emit — a coalesced
    # batch must never wait on a cold compile (the engine.warmup contract;
    # serve --microbatch --warmup does the same at startup)
    proxy.warmup()
    n = 3
    servers = []
    try:
        for i in range(n):
            llm = ScriptedLLM(
                ["Thought: Do I need to use a tool? Yes\n"
                 "Action: Synthesize Speech Given the User Input Text\n"
                 f"Action Input: session {i} says hello",
                 "Thought: Do I need to use a tool? No\nAI: spoken."])
            app = AppServer(llm, {"tts": proxy},
                            media_root=str(tmp_path / f"s{i}"))
            httpd = make_server(app, port=0)
            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            servers.append((httpd, httpd.server_address[1]))

        results = [None] * n

        def chat(i):
            body = json.dumps({"text": "speak"}).encode()
            results[i] = _req(servers[i][1], "/chat", body,
                              {"Content-Type": "application/json"})

        before = proxy.batcher.batches
        threads = [threading.Thread(target=chat, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, raw, _ in results:
            assert status == 200 and json.loads(raw)["steps"]
        made = proxy.batcher.batches - before
        assert proxy.batcher.items >= n
        assert made < n, f"expected coalescing across sessions, got {made}"
    finally:
        for httpd, _ in servers:
            httpd.shutdown()
        proxy.batcher.close()


def test_sketch_mask_inpaint_roundtrip(tmp_path):
    """The reference's drawn-mask inpaint loop (audio-chatgpt.py:418-540,
    1351-1374) over HTTP: upload clip → /inpaint/show returns a drawable mel
    PNG → POST /inpaint with a sketch PNG (alpha = regenerate) → artifact."""
    import base64
    import io
    import os

    from PIL import Image

    from audiogpt_tpu.engines.t2a import T2AConfig, T2AEngine
    from audiogpt_tpu.models.diffusion import UNetConfig, VAEConfig
    from audiogpt_tpu.models.textenc import BertConfig, CLAPTextConfig

    cfg = T2AConfig(
        unet=UNetConfig(in_channels=4, out_channels=4, model_channels=32,
                        num_res_blocks=1, channel_mult=(1, 2), num_heads=4,
                        context_dim=32, use_checkpoint=False),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), z_channels=4, embed_dim=4,
                      resolution=64),
        clap=CLAPTextConfig(
            bert=BertConfig(vocab_size=2000, hidden_size=32, num_layers=1,
                            num_heads=2, intermediate_size=64,
                            max_position=80),
            d_proj=32, max_length=16),
        mel_bins=16, mel_len=32, inpaint_mel_len=32, timesteps=100)
    root = str(tmp_path)
    app = AppServer(ScriptedLLM(["Thought: Do I need to use a tool? No\n"
                                 "AI: ok."]),
                    {"t2a": T2AEngine(cfg)}, media_root=root)
    httpd = make_server(app, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        os.makedirs(f"{root}/audio", exist_ok=True)
        sr = cfg.sample_rate
        t = np.arange(cfg.inpaint_mel_len * cfg.hop) / sr
        save_wav((0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
                 f"{root}/audio/clip.wav", sr)

        code, body, _ = _req(port, "/inpaint/show",
                             json.dumps({"audio": "audio/clip.wav"}).encode(),
                             {"Content-Type": "application/json"})
        assert code == 200, body
        meta = json.loads(body)
        assert meta["mel_bins"] == cfg.mel_bins
        assert meta["frames"] == cfg.inpaint_mel_len  # actual rendered width
        code, png, hdrs = _req(port, meta["image"])
        assert code == 200 and hdrs["Content-Type"] == "image/png"
        img = Image.open(io.BytesIO(png))
        assert img.size == (cfg.inpaint_mel_len, cfg.mel_bins)  # (W, H)

        # draw a white box on a transparent canvas — the UI overlay shape
        mask_img = Image.new("RGBA", img.size, (0, 0, 0, 0))
        for x in range(8, 16):
            for y in range(4, 12):
                mask_img.putpixel((x, y), (255, 255, 255, 255))
        buf = io.BytesIO()
        mask_img.save(buf, format="PNG")
        data_url = "data:image/png;base64," + \
            base64.b64encode(buf.getvalue()).decode()
        code, body, _ = _req(
            port, "/inpaint",
            json.dumps({"audio": "audio/clip.wav", "mask": data_url,
                        "text": "birds chirping", "ddim_steps": 3}).encode(),
            {"Content-Type": "application/json"})
        assert code == 200, body
        out = json.loads(body)
        # no vocoder attached to the tiny engine → mel image artifact
        url = out.get("audio") or out.get("image")
        assert url, out
        code, artifact, _ = _req(port, url)
        assert code == 200 and len(artifact) > 100

        # error paths
        code, body, _ = _req(port, "/inpaint", b"{}",
                             {"Content-Type": "application/json"})
        assert code == 400
    finally:
        httpd.shutdown()


def test_decode_mask_png_variants():
    """Alpha is the mask only when it varies (drawn-on-transparent overlay);
    a fully-opaque RGBA upload must fall back to luminance — otherwise the
    all-255 alpha plane reads as 'regenerate everything'."""
    import io

    import numpy as np
    from PIL import Image

    from audiogpt_tpu.serving.inpaint import decode_mask_png

    def png(img):
        b = io.BytesIO()
        img.save(b, format="PNG")
        return b.getvalue()

    # overlay: transparent canvas + white strokes → alpha carries the mask
    ov = Image.new("RGBA", (32, 16), (0, 0, 0, 0))
    for x in range(4, 8):
        for y in range(2, 6):
            ov.putpixel((x, y), (255, 255, 255, 255))
    m = decode_mask_png(png(ov), mel_bins=16)
    assert m.shape == (32, 16)
    assert m[5, 3] == 1.0 and m[0, 0] == 0.0 and m.sum() == 16.0

    # fully opaque RGBA (exported/painted mask) → luminance, NOT alpha
    op = Image.new("RGBA", (32, 16), (0, 0, 0, 255))
    for x in range(4, 8):
        for y in range(2, 6):
            op.putpixel((x, y), (255, 255, 255, 255))
    m2 = decode_mask_png(png(op), mel_bins=16)
    assert m2[5, 3] == 1.0 and m2[0, 0] == 0.0 and m2.sum() == 16.0

    # plain grayscale → luminance
    g = Image.new("L", (32, 16), 0)
    g.putpixel((4, 2), 255)
    m3 = decode_mask_png(png(g), mel_bins=16)
    assert m3[4, 2] == 1.0 and m3.sum() == 1.0


def test_tts_stream_endpoint(tmp_path):
    """GET /tts/stream streams a WAV progressively: streaming RIFF header
    first, then int16 PCM per synthesized clause chunk; bytes equal the
    engine's full synthesis within one int16 step."""
    import http.client
    import struct

    from audiogpt_tpu.engines.tts import TTSEngine
    from audiogpt_tpu.engines.vocoder import VocoderEngine
    from audiogpt_tpu.models.tts import FastSpeech2Config
    from audiogpt_tpu.models.vocoder import HifiGANConfig

    voc = VocoderEngine(
        "hifigan",
        HifiGANConfig(upsample_initial_channel=32, resblock_kernel_sizes=(3,),
                      resblock_dilation_sizes=((1, 3),)),
        buckets=(64, 128))
    eng = TTSEngine(
        cfg=FastSpeech2Config(vocab_size=128, hidden_size=32, enc_layers=1,
                              dec_layers=1, predictor_layers=2,
                              max_frames=128),
        vocoder=voc, token_buckets=(16, 32))
    llm = ScriptedLLM(["Thought: Do I need to use a tool? No\nAI: ok"])
    app = AppServer(llm, {"tts": eng}, media_root=str(tmp_path))
    httpd = make_server(app, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        text = "hello there. this is a second clause for chunking."
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/tts/stream?text=" +
                     urllib.parse.quote(text))
        r = conn.getresponse()
        assert r.status == 200
        assert r.headers["Content-Type"] == "audio/wav"
        assert r.headers.get("Content-Length") is None  # stream: EOF-delimited
        raw = r.read()
        conn.close()
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        assert struct.unpack("<I", raw[24:28])[0] == eng.sample_rate
        pcm = np.frombuffer(raw[44:], "<i2").astype(np.float32) / 32767.0
        ref = eng(text)
        assert pcm.shape == ref.shape
        assert np.abs(pcm - ref).max() <= 1.5 / 32767.0

        code, body, _ = _req(port, "/tts/stream?text=%20")
        assert code == 400
    finally:
        httpd.shutdown()


def test_tts_stream_without_engine_404(server):
    port, _, _ = server
    code, body, _ = _req(port, "/tts/stream?text=hi")
    assert code == 404
