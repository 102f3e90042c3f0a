"""Real-time voice path: energy VAD reply-on-pause semantics, the stdlib
WebSocket codec, and the /ws/voice conversation loop end-to-end
(reference: tools/gradio_voice.py — WebRTC + VAD ReplyOnPause)."""

import base64
import hashlib
import json
import os
import socket
import struct
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.utils.vad import ReplyOnPause, VadConfig

SR = 16000


def _speech(seconds, seed=0, level=0.3):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    return (
        level * np.sin(2 * np.pi * 220 * t)
        + 0.05 * rng.standard_normal(t.shape)
    ).astype(np.float32)


def _silence(seconds):
    return np.zeros(int(seconds * SR), np.float32)


def test_vad_reply_on_pause_segments_utterance():
    vad = ReplyOnPause(VadConfig(pause_ms=300, min_speech_ms=200))
    stream = np.concatenate([_silence(0.3), _speech(0.8), _silence(0.6)])
    outs = []
    for start in range(0, len(stream), 1600):  # 100 ms chunks
        out = vad.process(stream[start : start + 1600])
        if out is not None:
            outs.append(out)
    assert len(outs) == 1
    # utterance covers roughly the speech region (pre-roll + hangover)
    assert 0.7 * SR <= len(outs[0]) <= 1.6 * SR


def test_vad_drops_short_blips():
    vad = ReplyOnPause(VadConfig(pause_ms=300, min_speech_ms=400))
    stream = np.concatenate([_speech(0.15), _silence(0.8)])
    outs = [vad.process(stream[i : i + 1600]) for i in range(0, len(stream), 1600)]
    assert all(o is None for o in outs)


def test_vad_multiple_utterances_and_flush():
    vad = ReplyOnPause(VadConfig(pause_ms=300, min_speech_ms=200))
    stream = np.concatenate(
        [_speech(0.6, seed=1), _silence(0.5), _speech(0.7, seed=2)]
    )
    outs = []
    for i in range(0, len(stream), 1600):
        out = vad.process(stream[i : i + 1600])
        if out is not None:
            outs.append(out)
    final = vad.flush()
    assert len(outs) == 1
    assert final is not None and len(final) >= 0.5 * SR


def test_websocket_accept_key():
    from ultravox_tpu.inference.serving.websocket import accept_key

    # RFC 6455 §1.3 worked example
    assert (
        accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


# -- raw-socket websocket client for the e2e test ---------------------------


class _WsClient:
    def __init__(self, host, port, path):
        self.sock = socket.create_connection((host, port), timeout=120)
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        )
        self.sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += self.sock.recv(4096)
        # The server's 101 response and its first WS frame ("ready") can
        # coalesce into one TCP segment: anything read past the header
        # terminator is frame bytes and MUST be kept, or the client blocks
        # forever waiting for a frame the kernel already delivered (the
        # 120 s hang this test used to show intermittently).
        head, _, self._buf = resp.partition(b"\r\n\r\n")
        assert b"101" in head.split(b"\r\n")[0], head

    def send(self, opcode, payload: bytes):
        mask = os.urandom(4)
        header = bytes([0x80 | opcode])
        n = len(payload)
        if n < 126:
            header += bytes([0x80 | n])
        elif n < (1 << 16):
            header += bytes([0x80 | 126]) + struct.pack("!H", n)
        else:
            header += bytes([0x80 | 127]) + struct.pack("!Q", n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        self.sock.sendall(header + mask + masked)

    def _read_exact(self, n):
        data, self._buf = self._buf[:n], self._buf[n:]
        while len(data) < n:
            chunk = self.sock.recv(n - len(data))
            if not chunk:
                raise ConnectionError("closed")
            data += chunk
        return data

    def recv_json(self):
        head = self._read_exact(2)
        opcode = head[0] & 0x0F
        length = head[1] & 0x7F
        if length == 126:
            (length,) = struct.unpack("!H", self._read_exact(2))
        elif length == 127:
            (length,) = struct.unpack("!Q", self._read_exact(8))
        payload = self._read_exact(length)
        if opcode == 8:
            return None
        return json.loads(payload.decode())

    def close(self):
        self.sock.close()


@pytest.fixture(scope="module")
def voice_server():
    from http.server import ThreadingHTTPServer

    from ultravox_tpu.inference.serving.api_server import ServingAPI, make_handler
    from ultravox_tpu.inference.serving.engine import ServingEngine
    from ultravox_tpu.models import (
        DecoderConfig,
        UltravoxConfig,
        WhisperEncoderConfig,
    )
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.models.processor import (
        DataCollatorWithAudio,
        UltravoxProcessor,
    )

    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=32, num_layers=1, num_heads=2, ffn_dim=64
        ),
        text_config=DecoderConfig(
            vocab_size=384, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
        ),
        hidden_size=64,
    )
    params = uv.init_params(cfg, jax.random.key(0))
    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(tokenizer)
    collator = DataCollatorWithAudio(
        pad_token_id=tokenizer.pad_token_id, pad_multiple=1, mel_pad_multiple=400
    )
    engine = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=256, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128, 256), mel_len_buckets=(400, 1000, 2000),
    )
    api = ServingAPI(engine, processor, collator)
    engine.start()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(api))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield port
    server.shutdown()
    engine.stop()


@pytest.fixture(scope="module")
def streaming_voice_server():
    """Voice server over a BLOCK-CAUSAL model: the WS handler encodes
    incrementally while 'speech' streams in and submits precomputed audio
    embeddings (inference/streaming.py)."""
    from http.server import ThreadingHTTPServer

    from ultravox_tpu.inference.serving.api_server import ServingAPI, make_handler
    from ultravox_tpu.inference.serving.engine import ServingEngine
    from ultravox_tpu.models import (
        DecoderConfig,
        UltravoxConfig,
        WhisperEncoderConfig,
    )
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.models.processor import (
        DataCollatorWithAudio,
        UltravoxProcessor,
    )

    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=32, num_layers=1, num_heads=2, ffn_dim=64,
            max_source_positions=128,
        ),
        text_config=DecoderConfig(
            vocab_size=384, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
        ),
        hidden_size=64,
        audio_latency_block_size=16,  # 0.32 s latency blocks
    )
    params = uv.init_params(cfg, jax.random.key(0))
    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(tokenizer)
    collator = DataCollatorWithAudio(
        pad_token_id=tokenizer.pad_token_id, pad_multiple=1, mel_pad_multiple=400
    )
    engine = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=256, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128, 256), mel_len_buckets=(400, 1000, 2000),
    )
    api = ServingAPI(engine, processor, collator)
    engine.start()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(api))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield port, engine
    server.shutdown()
    engine.stop()


def test_voice_ws_streaming_encode_end_to_end(streaming_voice_server):
    """Two conversation turns over the incremental-encode path: the audio
    tower runs during 'speech' (blocks encoded before end-of-utterance) and
    the submit carries precomputed embeddings + content fingerprints (the
    second turn must still adopt the retained prefix)."""
    port, engine = streaming_voice_server
    client = _WsClient("127.0.0.1", port, "/ws/voice")
    try:
        assert client.recv_json()["type"] == "ready"
        stream = np.concatenate([_speech(1.0), _silence(1.2)])
        pcm = (np.clip(stream, -1, 1) * 32767).astype(np.int16)
        for i in range(0, len(pcm), 1600):
            client.send(0x2, pcm[i : i + 1600].tobytes())
        events = []
        while True:
            ev = client.recv_json()
            assert ev is not None
            events.append(ev)
            if ev["type"] == "turn_end":
                break
        kinds = [e["type"] for e in events]
        assert kinds[0] == "utterance"
        assert "token" in kinds

        stream2 = np.concatenate([_speech(0.8, seed=7), _silence(1.2)])
        pcm2 = (np.clip(stream2, -1, 1) * 32767).astype(np.int16)
        for i in range(0, len(pcm2), 1600):
            client.send(0x2, pcm2[i : i + 1600].tobytes())
        while True:
            ev = client.recv_json()
            assert ev is not None
            if ev["type"] == "turn_end":
                break
        # the second turn reused the first turn's retained cache (audio
        # fingerprints matched via the submitted spans)
        assert engine.reused_prefix_tokens >= engine.min_reuse_tokens
    finally:
        client.close()


def test_voice_ws_end_to_end(voice_server):
    port = voice_server
    client = _WsClient("127.0.0.1", port, "/ws/voice")
    try:
        assert client.recv_json()["type"] == "ready"
        # stream ~1 s of speech then silence in 100 ms PCM16 frames
        stream = np.concatenate([_speech(1.0), _silence(1.2)])
        pcm = (np.clip(stream, -1, 1) * 32767).astype(np.int16)
        for i in range(0, len(pcm), 1600):
            client.send(0x2, pcm[i : i + 1600].tobytes())
        events = []
        while True:
            ev = client.recv_json()
            assert ev is not None
            events.append(ev)
            if ev["type"] == "turn_end":
                break
        kinds = [e["type"] for e in events]
        assert kinds[0] == "utterance"
        assert "token" in kinds
        assert isinstance(events[-1]["text"], str)

        # second turn reuses the conversation (reply-on-pause again)
        stream2 = np.concatenate([_speech(0.8, seed=7), _silence(1.2)])
        pcm2 = (np.clip(stream2, -1, 1) * 32767).astype(np.int16)
        for i in range(0, len(pcm2), 1600):
            client.send(0x2, pcm2[i : i + 1600].tobytes())
        while True:
            ev = client.recv_json()
            assert ev is not None
            if ev["type"] == "turn_end":
                break
    finally:
        client.close()
