"""GPT-judge evaluation via an OpenAI-compatible chat endpoint.

Re-design of the reference's ``gpt_eval*.py`` family: a singleton evaluator
with Jinja2 user prompts and three answer parsers (binary-with-reason, scalar
rating, yes/no), and judge prompt templates for the instruct / conversation /
boolq / bigbench / audiobench tasks. The HTTP client is injectable so tests
mock it (reference: gpt_eval_test.py mocks the OpenAI client).
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, Optional

from ultravox_tpu.evaluation.metrics import EvalResult, EvalSample

logger = logging.getLogger(__name__)

RATING_MODEL = "gpt-4o"

JUDGE_PROMPTS: Dict[str, Dict[str, str]] = {
    "instruct": {
        "system": (
            "You are an expert evaluator. Decide whether the agent followed "
            "the user's instruction. Respond with 'True' or 'False' followed "
            "by a short justification."
        ),
        "user": (
            "Instruction: {{ question }}\n\nAgent response: {{ generated_answer }}"
            "\n\nDid the agent follow the instruction?"
        ),
        "parser": "binary",
    },
    "conversation": {
        "system": (
            "You are an expert evaluator of voice assistants. Given the "
            "conversation history and the latest user turn, decide if the "
            "agent's response is appropriate and helpful. Respond with "
            "'True' or 'False' and a short justification."
        ),
        "user": (
            "{% if history %}History:\n{% for m in history %}{{ m.role }}: "
            "{{ m.content }}\n{% endfor %}\n{% endif %}"
            "User: {{ question }}\nAgent: {{ generated_answer }}\n\n"
            "Is the agent response appropriate?"
        ),
        "parser": "binary",
    },
    "boolq": {
        "system": (
            "Compare the agent's answer to the expected true/false answer. "
            "Respond 'True' if they agree, otherwise 'False'."
        ),
        "user": (
            "Expected: {{ expected_answer }}\nAgent: {{ generated_answer }}"
        ),
        "parser": "binary",
    },
    "bigbench": {
        "system": (
            "Decide whether the model answer matches the reference answer "
            "for this reasoning task. Respond 'True' or 'False'."
        ),
        "user": (
            "Question: {{ question }}\nReference: {{ expected_answer }}\n"
            "Model: {{ generated_answer }}"
        ),
        "parser": "binary",
    },
    "audiobench_binary": {
        "system": (
            "Judge the model response against the reference. Respond 'True' "
            "if acceptable, else 'False'."
        ),
        "user": (
            "Question: {{ question }}\nReference: {{ expected_answer }}\n"
            "Response: {{ generated_answer }}"
        ),
        "parser": "binary",
    },
    "audiobench_scalar": {
        "system": (
            "Rate the model response against the reference on a 0-5 scale. "
            "Respond with 'Rating: <n>' and a justification."
        ),
        "user": (
            "Question: {{ question }}\nReference: {{ expected_answer }}\n"
            "Response: {{ generated_answer }}"
        ),
        "parser": "scalar",
    },
}


def parse_binary(text: str) -> EvalResult:
    m = re.search(r"\b(true|false)\b", text, re.IGNORECASE)
    if not m:
        return EvalResult(score=-1.0, reason=f"unparseable: {text[:200]}")
    return EvalResult(
        score=1.0 if m.group(1).lower() == "true" else 0.0, reason=text.strip()
    )


def parse_scalar(text: str, scale: float = 5.0) -> EvalResult:
    m = re.search(r"(?:rating[:\s]*)?(\d+(?:\.\d+)?)\s*(?:/\s*5)?", text, re.IGNORECASE)
    if not m:
        return EvalResult(score=-1.0, reason=f"unparseable: {text[:200]}")
    return EvalResult(score=float(m.group(1)) / scale, reason=text.strip())


def parse_yes_no(text: str) -> EvalResult:
    m = re.search(r"\b(yes|no)\b", text, re.IGNORECASE)
    if not m:
        return EvalResult(score=-1.0, reason=f"unparseable: {text[:200]}")
    return EvalResult(score=float(m.group(1).lower() == "yes"), reason=text.strip())


class GPTBasedEvaluator:
    """Singleton judge client. ``client`` is any object with
    ``chat.completions.create`` (OpenAI SDK compatible) — injected in tests."""

    def __init__(self):
        self.client: Any = None
        self.model = os.environ.get("GPT_EVAL_MODEL", RATING_MODEL)

    def _ensure_client(self):
        if self.client is None:
            import openai  # optional dependency

            self.client = openai.OpenAI()
        return self.client

    def ask(self, system: str, user: str, max_tokens: int = 256) -> str:
        client = self._ensure_client()
        response = client.chat.completions.create(
            model=self.model,
            messages=[
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ],
            max_tokens=max_tokens,
            temperature=0.0,
        )
        return response.choices[0].message.content or ""


gpt_evaluator = GPTBasedEvaluator()

_PARSERS = {"binary": parse_binary, "scalar": parse_scalar, "yes_no": parse_yes_no}


def make_judge_metric(name: str):
    import jinja2

    spec = JUDGE_PROMPTS[name]
    parser = _PARSERS[spec["parser"]]
    user_template = jinja2.Template(spec["user"])

    def metric(sample: EvalSample, args: Dict[str, Any]) -> EvalResult:
        user = user_template.render(
            question=sample.question,
            expected_answer=sample.expected_answer,
            generated_answer=sample.generated_answer,
            transcript=sample.transcript,
            history=sample.history,
            **args,
        )
        try:
            text = gpt_evaluator.ask(spec["system"], user)
        except Exception as e:  # endpoint unavailable
            logger.warning("gpt judge %s failed: %s", name, e)
            return EvalResult(score=-1.0, reason=str(e))
        return parser(text)

    return metric
