"""Regenerate README.md's performance table from a driver bench JSON.

VERDICT r2 #10: every README perf claim must quote the driver-captured
bench line verbatim. Usage:

    python scripts/update_readme_perf.py BENCH_r03.json   # or bench.py output

Accepts either the driver's wrapper JSON ({"parsed": {...}}) or the raw
one-line JSON bench.py prints. Rows whose bench field is absent keep a
placeholder so a partial bench never silently fabricates a number.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

START = "<!-- bench-table-start (scripts/update_readme_perf.py) -->"
END = "<!-- bench-table-end -->"


def _fmt(metrics, key, pattern, scale=1.0, digits=0):
    v = metrics.get(key)
    if v is None or isinstance(v, str):
        return None
    return pattern.format(round(v * scale, digits if digits else None))


def build_rows(m):
    def f(key, digits=0):
        v = m.get(key)
        if v is None or isinstance(v, str):
            return None
        return f"{v:.{digits}f}" if digits else f"{v:,.0f}"

    rows = []

    def row(label, value, target="—"):
        rows.append(f"| {label} | {value} | {target} |")

    enc = f("value")
    enc_q = f("audio_encoder_rtfx_per_chip_int8")
    mfu = f("encoder_mfu_pct", 1)
    if enc:
        mfu_s = f" ({mfu}% MFU)" if mfu else ""
        row(
            "Audio-encoder throughput (whisper-large-v3-turbo class, incl. "
            "on-device mel)",
            f"**{enc}× real-time** bf16{mfu_s}; **{enc_q}×** int8",
            ">30×",
        )
    ttft = f("ttft_ms_p50_10s_audio_1b", 1)
    if ttft:
        row(
            "TTFT, 10 s audio → first-token logits (1B-class flagship, bf16)",
            f"**{ttft} ms p50**",
            "<200 ms (8B/v5p-8)",
        )
    dec = f("decode_tok_s_batch8_1b")
    dec2k = f("decode_tok_s_batch8_1b_2k_ctx")
    deci = f("decode_tok_s_batch8_1b_int8")
    rb = f("decode_roofline_pct_bf16", 1)
    ri = f("decode_roofline_pct_int8", 1)
    if dec:
        rb_s = f", {rb}% of weight-traffic roofline" if rb else ""
        ri_s = f" ({ri}%)" if ri else ""
        row(
            "Decode throughput, batch 8, fused segmented scan (1B-class "
            "flagship)",
            f"**{dec} tok/s** bf16 ({dec2k} at 2K context{rb_s}); "
            f"**{deci} tok/s** int8{ri_s}",
        )
    srv = f("serving_tok_s_8slots_1.5k_prompt_2k_ctx_paged")
    srv_pct = f("serving_vs_fused_decode_pct", 1)
    if srv:
        row(
            "Serving engine END-TO-END, 8 slots × 1.5K-token prompts, 2K ctx "
            "(1B, continuous batching + chunked prefill + pipelined "
            "dispatch, default auto flags)",
            f"**{srv} tok/s** ({srv_pct}% of the fused-scan decode rate at "
            "the same batch/context)",
        )
    t8 = f("8b_dims_ttft_ms_est_10s_audio_8chip", 1)
    if t8:
        row(
            "8B-dims TTFT estimate, 10 s audio, v5e-8 sharded (layer-sliced "
            "measurement)",
            f"**~{t8} ms**",
            "<200 ms",
        )
    m8t = f("8b_int8_ttft_ms_10s_audio_1chip_measured", 1)
    m8d = f("8b_int8_decode_tok_s_batch8_1chip_measured")
    if m8t:
        row(
            "8B int8 on ONE chip (measured, full 32 layers): TTFT / decode",
            f"**{m8t} ms / {m8d} tok/s @ batch 8**",
            "<200 ms on 8 chips",
        )
    t70_16 = f("70b_dims_ttft_ms_est_10s_audio_16chip", 1)
    t70d = f("70b_dims_decode_tok_s_batch8_1chip_equiv", 1)
    if t70_16:
        row(
            "70B-dims (Llama-3.3 flagship dims, layer-sliced): TTFT estimate "
            "v5e-16 / decode 1-chip-equiv",
            f"**~{t70_16} ms / {t70d} tok/s @ batch 8** (see docs/70b.md)",
            "<200 ms",
        )
    tr = f("train_samples_s_1b_kl_10s_audio_batch8", 1)
    if tr:
        row(
            "KL-distillation adapter training (1B flagship, 10 s "
            "audio/sample, bf16, remat, chunked vocab loss)",
            f"**{tr} samples/s** @ batch 8",
        )
    return rows


def main():
    src = pathlib.Path(sys.argv[1])
    data = json.loads(src.read_text())
    metrics = data.get("parsed", data)
    readme = pathlib.Path(__file__).resolve().parents[1] / "README.md"
    text = readme.read_text()
    if START not in text:
        raise SystemExit(
            f"README.md lacks the {START} marker — add it around the table"
        )
    table = "\n".join(
        ["| Metric | Value | Target |", "|---|---|---|"] + build_rows(metrics)
    )
    new = re.sub(
        re.escape(START) + r".*?" + re.escape(END),
        START + "\n" + table + "\n" + END,
        text,
        flags=re.S,
    )
    readme.write_text(new)
    print(f"README table regenerated from {src}")


if __name__ == "__main__":
    main()
