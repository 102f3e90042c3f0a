"""Streaming audio frontend: incremental mel + block-causal encode.

For models trained with ``audio_latency_block_size`` (reference:
streaming_tinyllama.yaml:24) the encoder is block-causal, so audio can be
ENCODED WHILE THE USER IS STILL SPEAKING: each completed latency block runs
one ``encoder_stream_step`` (O(block) work against the cached K/V — see
models/whisper_encoder.py), and at end-of-utterance only the final partial
block plus the projector remain on the critical path. The serving voice
demo uses this to pull the audio tower off the pause-to-first-token path.

Mel caveat: Whisper's log-mel clamps at (global max - 8.0) — a whole-
utterance statistic. The streaming frontend clamps each block with the
RUNNING max at emit time, so frames quieter than 80 dB below the
eventual peak can differ from the batch frontend if the peak arrives
later; everything above that floor is bit-identical. In practice this
touches only near-silence frames.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ultravox_tpu.models import projector as projector_lib
from ultravox_tpu.models import whisper_encoder as encoder_lib
from ultravox_tpu.ops import mel as mel_lib


class EncoderWindowExceeded(ValueError):
    """The streamed utterance outgrew the encoder's single-window stream
    state; callers fall back to the batch path's 30 s chunking."""


class StreamingMel:
    """Incremental Whisper log-mel: ``feed`` returns frames that are final
    given the audio so far (a frame needs 200 samples of lookahead);
    ``finalize`` emits the tail frames using the batch frontend's
    reflect-at-end padding."""

    def __init__(self, num_mel_filters: int = 80):
        self.n_mels = num_mel_filters
        self._samples = np.zeros(0, np.float32)
        self._emitted = 0  # frames already returned
        self._running_max = -np.inf

    @property
    def frames_emitted(self) -> int:
        return self._emitted

    def _raw_frames(self, a: int, b: int, final: bool) -> np.ndarray:
        """log10 mel (pre-clamp) for frames [a, b)."""
        half = mel_lib.N_FFT // 2
        hop = mel_lib.HOP_LENGTH
        lo = a * hop - half
        hi = (b - 1) * hop + half + 1
        left_pad = max(-lo, 0)
        right_pad = max(hi - len(self._samples), 0)
        seg = self._samples[max(lo, 0): min(hi, len(self._samples))]
        seg = np.asarray(seg, np.float64)
        if left_pad or right_pad:
            # stream edges reproduce the batch frontend's reflect padding
            seg = np.pad(seg, (left_pad, right_pad), mode="reflect")
        window = mel_lib.hann_window(mel_lib.N_FFT)
        idx = (
            np.arange(b - a)[:, None] * hop + np.arange(mel_lib.N_FFT)[None]
        )
        frames = seg[idx] * window[None]
        power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        fb = mel_lib.mel_filter_bank(
            num_mel_filters=self.n_mels
        ).astype(np.float64)
        return np.log10(np.maximum(power @ fb, 1e-10)).T  # (n_mels, b-a)

    def _emit(self, upto: int, final: bool) -> Optional[np.ndarray]:
        if upto <= self._emitted:
            return None
        raw = self._raw_frames(self._emitted, upto, final)
        self._running_max = max(self._running_max, float(raw.max()))
        out = np.maximum(raw, self._running_max - 8.0)
        out = ((out + 4.0) / 4.0).astype(np.float32)
        self._emitted = upto
        return out

    def feed(self, samples: np.ndarray) -> Optional[np.ndarray]:
        """Append samples; return newly-final frames (n_mels, n_new) or
        None. Frame f needs samples through f*hop + n_fft/2."""
        self._samples = np.concatenate(
            [self._samples, np.asarray(samples, np.float32)]
        )
        half, hop = mel_lib.N_FFT // 2, mel_lib.HOP_LENGTH
        safe = (len(self._samples) - half - 1) // hop + 1
        # batch frontend emits len//hop frames total; never exceed that
        safe = min(max(safe, 0), len(self._samples) // hop)
        return self._emit(safe, final=False)

    def finalize(self) -> Optional[np.ndarray]:
        """Emit the remaining frames with reflect-at-end padding (matching
        ``log_mel_spectrogram_np`` on the complete waveform)."""
        total = len(self._samples) // mel_lib.HOP_LENGTH
        return self._emit(total, final=True)


@functools.lru_cache(maxsize=4)
def _jit_stream_step(cfg, block_size):
    return jax.jit(
        functools.partial(
            encoder_lib.encoder_stream_step, cfg=cfg, block_size=block_size
        ),
        donate_argnums=(1,),
    )


class StreamingAudioEncoder:
    """Drives incremental block-causal encode + projection for one
    utterance. Feed PCM float32; ``finalize`` returns the audio token
    embeddings (n_tokens, d_text) with everything but the final partial
    block already computed during the stream."""

    def __init__(self, params, cfg, *, dtype=jnp.float32):
        assert cfg.audio_latency_block_size, (
            "streaming encode requires a block-causal encoder "
            "(audio_latency_block_size set)"
        )
        self.params = params
        self.cfg = cfg
        self.block = int(cfg.audio_latency_block_size)  # encoder positions
        self.acfg = cfg.audio_config
        self.mel = StreamingMel(self.acfg.num_mel_bins)
        self.state = encoder_lib.EncoderStreamState.zeros(self.acfg, dtype)
        self._step = _jit_stream_step(self.acfg, self.block)
        self._mel_frames = np.zeros((self.acfg.num_mel_bins, 0), np.float32)
        self._outputs: List[np.ndarray] = []  # per-block (C, d_model)
        self._blocks_done = 0
        self._total_mel = 0  # valid mel frames seen (streaming + final)
        self._dtype = dtype

    def _window(self, k: int) -> np.ndarray:
        """Mel window [2kC-2, 2(k+1)C+1) with zero padding outside the
        stream (matching the batch conv's zero padding)."""
        C2 = 2 * self.block
        lo, hi = k * C2 - 2, (k + 1) * C2 + 1
        n = self._mel_frames.shape[1]
        w = np.zeros((self.acfg.num_mel_bins, hi - lo), np.float32)
        s, e = max(lo, 0), min(hi, n)
        if e > s:
            w[:, s - lo: e - lo] = self._mel_frames[:, s:e]
        return w

    def _check_window(self):
        """The stream state covers ONE encoder window (max_source_positions
        ≈ 30 s); past it the fixed-size KV/position buffers would clamp and
        silently corrupt earlier blocks. Callers catch this to fall back to
        the batch path, which chunks long audio correctly."""
        if (self._blocks_done + 1) * self.block > self.acfg.max_source_positions:
            raise EncoderWindowExceeded(
                f"utterance exceeds the {self.acfg.max_source_positions}"
                "-position encoder window; use the batch path (30 s "
                "chunking via audio_is_continuation) for longer audio"
            )

    def _run_ready_blocks(self):
        """Step every block whose full mel window (incl. 1-frame lookahead)
        is available."""
        C2 = 2 * self.block
        n = self._mel_frames.shape[1]
        while (self._blocks_done + 1) * C2 + 1 <= n:
            self._check_window()
            k = self._blocks_done
            st, out = self._step(
                self.params["audio_tower"],
                self.state,
                jnp.asarray(self._window(k)),
                jnp.asarray(self.block, jnp.int32),
            )
            self.state = st
            self._outputs.append(np.asarray(out))
            self._blocks_done += 1

    def feed(self, samples: np.ndarray) -> None:
        new = self.mel.feed(samples)
        if new is not None:
            self._mel_frames = np.concatenate(
                [self._mel_frames, new], axis=1
            )
        self._run_ready_blocks()

    @property
    def blocks_encoded(self) -> int:
        return self._blocks_done

    def finalize(self) -> np.ndarray:
        """Complete the stream: encode the remaining (partial + padding)
        blocks and run the projector. Returns (n_tokens, d_text)."""
        tail = self.mel.finalize()
        if tail is not None:
            self._mel_frames = np.concatenate(
                [self._mel_frames, tail], axis=1
            )
        self._run_ready_blocks()
        mel_len = self._mel_frames.shape[1]
        feat_len = (mel_len - 1) // 2 + 1 if mel_len else 0
        compression = 2 * self.cfg.stack_factor  # conv ds x frame stack
        n_tokens = -(-mel_len // compression)
        # positions the projector will stack (incl. batch-path padding
        # positions of the last token) — keep stepping zero-mel blocks
        need_pos = n_tokens * self.cfg.stack_factor
        if n_tokens == 0:
            # an empty (sub-hop) stream has no audio tokens; shape-correct
            # empty output instead of a concatenate crash
            d_text = self.params["projector"]["linear_2"]["kernel"].shape[-1]
            return np.zeros((0, int(d_text)), np.float32)
        C = self.block
        while self._blocks_done * C < need_pos:
            self._check_window()
            k = self._blocks_done
            n_valid = int(np.clip(feat_len - k * C, 0, C))
            st, out = self._step(
                self.params["audio_tower"],
                self.state,
                jnp.asarray(self._window(k)),
                jnp.asarray(n_valid, jnp.int32),
            )
            self.state = st
            self._outputs.append(np.asarray(out))
            self._blocks_done += 1
        enc = np.concatenate(self._outputs, axis=0)[:need_pos]
        embeds = _jit_projector(self.cfg)(
            self.params["projector"], jnp.asarray(enc[None], self._dtype)
        )
        return np.asarray(embeds[0, :n_tokens])


@functools.lru_cache(maxsize=4)
def _jit_projector(cfg):
    return jax.jit(
        lambda p, enc: projector_lib.projector_forward(p, cfg, enc)
    )
