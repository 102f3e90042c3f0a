"""On-device token sampling: greedy, temperature, top-k, top-p.

Replaces HF ``generate``'s logits processors (reference: inference/infer.py
:309-342 uses greedy vs temperature sampling only; top-k/top-p added for
serving parity with vLLM-based deployment).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0  # 1.0 => disabled
    min_p: float = 0.0  # 0 => disabled (vLLM-style min-p)
    max_tokens: int = 512


def sample_token(
    logits: jax.Array,  # (B, V) float
    rng: jax.Array,
    *,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
) -> jax.Array:
    """Sample next token ids (B,) int32. Static sampling config (baked into
    the compiled decode step)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_mask = cum - probs > top_p
        cutoff_logit = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)
    if min_p > 0.0:
        probs = jax.nn.softmax(logits, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        logits = jnp.where(probs < min_p * pmax, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def sample_slots(
    logits: jax.Array,  # (B, V) float
    samp: jax.Array,  # (B, >=4) float32: [temperature, top_k, top_p, min_p]
    rng: jax.Array,
    seeds: jax.Array | None = None,  # (B,) int32, -1 = unseeded
    positions: jax.Array | None = None,  # (B,) int32 per-request progress
) -> jax.Array:
    """Per-row DYNAMIC sampling for the serving engine: each row carries its
    own temperature / top-k / top-p / min-p, so one compiled program serves
    every mix of per-request configs (vLLM sampling-params parity; the
    reference deploys through vLLM, run_vllm_inference.py:185-199).

    Greedy where temperature == 0. The filters need a descending sort of
    the row; that cost is paid only when some row actually enables top-k /
    top-p / min-p (device-side cond — the all-plain branch is the common
    chat case and stays sort-free).

    ``seeds``/``positions``: rows with seed >= 0 draw from a key derived
    ONLY from (seed, position) — the same request replayed with the same
    seed produces identical samples regardless of what other requests are
    co-batched (continuous-batching-independent reproducibility; OpenAI
    ``seed`` semantics)."""
    temps = samp[:, 0]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sampled(_):
        scaled = scale_and_filter_logits(logits, samp)
        keys = slot_keys(rng, logits.shape[0], seeds, positions)
        drawn = jax.vmap(jax.random.categorical)(keys, scaled).astype(
            jnp.int32
        )
        return jnp.where(temps > 0, drawn, greedy)

    # all-greedy batches (the common chat/serving case) skip the gumbel
    # draw over the full vocab entirely — device-side cond, one program
    return jax.lax.cond(
        jnp.any(temps > 0), sampled, lambda _: greedy, None
    )


def scale_and_filter_logits(logits: jax.Array, samp: jax.Array) -> jax.Array:
    """Temperature-scale + dynamically filter a batch of logit rows with
    per-row top-k / top-p / min-p (``samp`` cols 0..3). The sort the
    filters need runs only when some row enables one (device cond)."""
    temps = samp[:, 0]
    top_ks = samp[:, 1]
    top_ps = samp[:, 2]
    min_ps = samp[:, 3]
    scaled = logits.astype(jnp.float32) / jnp.maximum(temps, 1e-6)[:, None]

    def plain(x):
        return x

    def filtered(x):
        V = x.shape[-1]
        desc = -jnp.sort(-x, axis=-1)  # descending
        probs = jax.nn.softmax(desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        ranks = jnp.arange(V, dtype=jnp.int32)[None]
        k = top_ks.astype(jnp.int32)[:, None]
        keep = jnp.where(k > 0, ranks < k, True)
        # keep tokens until cumulative prob exceeds top_p (top-1 always kept)
        keep &= (cum - probs) <= top_ps[:, None]
        keep &= probs >= min_ps[:, None] * probs[:, :1]
        cutoff = jnp.min(
            jnp.where(keep, desc, jnp.inf), axis=-1, keepdims=True
        )
        return jnp.where(x < cutoff, -jnp.inf, x)

    need = jnp.any((top_ks > 0) | (top_ps < 1.0) | (min_ps > 0))
    return jax.lax.cond(need, filtered, plain, scaled)


def slot_keys(rng, n: int, seeds=None, positions=None):
    """(n,) PRNG keys: split from ``rng``, with rows whose seed >= 0
    replaced by keys derived ONLY from (seed, position) — co-batch- and
    schedule-independent reproducibility (OpenAI ``seed`` semantics)."""
    keys = jax.random.split(rng, n)
    if seeds is not None:
        base = jax.random.key(0x5EED)

        def mk(s, p):
            return jax.random.fold_in(
                jax.random.fold_in(base, s.astype(jnp.uint32)),
                p.astype(jnp.uint32),
            )

        seeded = jax.vmap(mk)(seeds, positions)
        kd = jnp.where(
            (seeds >= 0)[:, None],
            jax.random.key_data(seeded),
            jax.random.key_data(keys),
        )
        keys = jax.random.wrap_key_data(kd)
    return keys


def spec_accept_slots(
    logits: jax.Array,  # (B, T, V) verify logits; T = K + 1
    drafts: jax.Array,  # (B, K) int32 proposed tokens
    samp: jax.Array,  # (B, >=4) float32: [temperature, top_k, top_p, min_p]
    rng: jax.Array,
    seeds: jax.Array | None = None,  # (B,) int32, -1 = unseeded
    positions: jax.Array | None = None,  # (B,) absolute index of emit 0
):
    """Speculative accept/reject for a POINT-MASS draft distribution
    (prompt-lookup drafts are deterministic), per slot with dynamic
    per-row sampling params.

    Returns ``(out (B, T) int32, accepted (B,) int32 in [1, T])``: row b
    emits ``out[b, :accepted[b]]``. For each draft position i the draft
    x_i is accepted with probability p_i(x_i) (p = temperature-scaled +
    filtered softmax); the first rejection emits a sample from the
    residual distribution (p_i with x_i zeroed, renormalized); if all K
    drafts are accepted a bonus token samples from p_K. This is the
    standard speculative-sampling acceptance rule specialized to q = point
    mass, so emitted tokens are distributed EXACTLY as ancestral sampling
    from p — speculation changes cost, not the distribution. Greedy rows
    (temperature 0) bypass the stochastic path entirely: accept iff
    draft == argmax, emit argmax — bit-identical to non-speculative
    greedy decode.

    Rows with seed >= 0 derive position-indexed keys (fold_in(seed,
    positions + i)), so a seeded request reproduces its stream regardless
    of co-batched requests or when speculation engaged; the residual draw
    uses an independently folded subkey so rejection does not bias it."""
    B, T, V = logits.shape
    K = T - 1
    temps = samp[:, 0]
    bidx = jnp.arange(B, dtype=jnp.int32)
    flat = logits.reshape(B * T, V)
    samp_rep = jnp.repeat(samp, T, axis=0)  # row-major: (b, i) -> b*T + i
    scaled = scale_and_filter_logits(flat, samp_rep).reshape(B, T, V)
    probs = jax.nn.softmax(scaled, axis=-1)
    argmaxes = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)

    if positions is None:
        positions = jnp.zeros((B,), jnp.int32)
    pos_grid = positions[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    seeds_rep = (
        None if seeds is None else jnp.repeat(seeds, T, axis=0)
    )
    keys = slot_keys(
        rng, B * T, seeds_rep,
        None if seeds is None else pos_grid.reshape(-1),
    ).reshape(B, T)

    # accept test per draft position: u_i < p_i(x_i) (greedy: exact match)
    u = jax.vmap(jax.vmap(jax.random.uniform))(keys[:, :K])  # (B, K)
    p_draft = jnp.take_along_axis(
        probs[:, :K], drafts[..., None], axis=-1
    )[..., 0]
    acc_ok = jnp.where(
        (temps > 0)[:, None], u < p_draft, drafts == argmaxes[:, :K]
    )
    lead = jnp.sum(
        jnp.cumprod(acc_ok.astype(jnp.int32), axis=1), axis=1
    )  # (B,) leading accepts; emit position `lead` is the fresh token
    accepted = lead + 1

    # the fresh token: residual sample at the first rejection (draft zeroed,
    # independent subkey), bonus sample from p_K when everything accepted
    final_scaled = scaled[bidx, lead]  # (B, V)
    rejected_draft = jnp.take_along_axis(
        jnp.concatenate([drafts, drafts[:, -1:]], axis=1), lead[:, None], 1
    )[:, 0]
    kill = (lead < K)[:, None] & (
        jnp.arange(V, dtype=jnp.int32)[None] == rejected_draft[:, None]
    )
    final_scaled = jnp.where(kill, -jnp.inf, final_scaled)
    final_keys = jax.vmap(jax.random.fold_in)(
        keys[bidx, lead], jnp.ones((B,), jnp.uint32)
    )
    final_sampled = jax.vmap(jax.random.categorical)(
        final_keys, final_scaled
    ).astype(jnp.int32)
    final = jnp.where(temps > 0, final_sampled, argmaxes[bidx, lead])

    out = jnp.concatenate([drafts, drafts[:, -1:]], axis=1)  # (B, T)
    out = out.at[bidx, lead].set(final)
    return out, accepted.astype(jnp.int32)


def apply_penalties(
    logits: jax.Array,  # (B, V) float
    out_counts: jax.Array,  # (B, V) int32 — per-row OUTPUT token counts
    prompt_mask: jax.Array,  # (B, V) bool — tokens present in the prompt
    samp: jax.Array,  # (B, >=7) float32; cols 4..6 = presence, freq, rep
) -> jax.Array:
    """vLLM-semantics sampling penalties, vectorized per row: repetition
    penalty over prompt+output tokens (divide positive / multiply negative
    logits), then presence (flat) and frequency (count-proportional)
    penalties over output tokens. Disabled rows (0 / 0 / 1) are exact
    no-ops, so penalized and penalty-free requests share one program."""
    pres = samp[:, 4:5]
    freq = samp[:, 5:6]
    rep = jnp.where(samp[:, 6:7] <= 0, 1.0, samp[:, 6:7])
    lf = logits.astype(jnp.float32)
    cnt = out_counts.astype(jnp.float32)
    seen = (out_counts > 0) | prompt_mask
    lf = jnp.where(seen, jnp.where(lf > 0, lf / rep, lf * rep), lf)
    lf = lf - pres * (out_counts > 0) - freq * cnt
    return lf


MAX_TOP_LOGPROBS = 5


def token_logprobs(logits: jax.Array, sampled: jax.Array, k: int = MAX_TOP_LOGPROBS):
    """Per-row log-softmax stats for OpenAI ``logprobs``: the sampled
    token's logprob plus the top-``k`` alternatives (ids + logprobs).

    Computed on the post-penalty/logit_bias, pre-temperature logits (vLLM
    semantics): penalties and bias redefine the distribution itself and are
    applied by the caller before this, while temperature/top-k/top-p only
    shape sampling and are NOT reflected in the reported logprobs.
    """
    lf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lf, axis=-1, keepdims=True)
    chosen = jnp.take_along_axis(lf, sampled[:, None].astype(jnp.int32), axis=-1)
    top_vals, top_ids = jax.lax.top_k(lf, k)
    return (
        (chosen - lse)[:, 0],
        top_ids.astype(jnp.int32),
        top_vals - lse,
    )
