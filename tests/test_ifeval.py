"""IFEval checker battery + VoiceBench evaluator tests."""

import pytest

from ultravox_tpu.evaluation import ifeval
from ultravox_tpu.evaluation.metrics import EvalSample
from ultravox_tpu.evaluation.voicebench import (
    extract_mcq_answer,
    voicebench_harm,
    voicebench_ifeval,
    voicebench_mcq,
    voicebench_qa,
)


@pytest.mark.parametrize(
    "inst,kw,good,bad",
    [
        ("keywords:existence", {"keywords": ["cat", "dog"]},
         "The cat saw a dog.", "The cat slept."),
        ("keywords:frequency", {"keyword": "yes", "frequency": 2, "relation": "at least"},
         "yes and yes again", "yes once"),
        ("keywords:forbidden_words", {"forbidden_words": ["bad"]},
         "all good here", "this is bad"),
        ("keywords:letter_frequency", {"letter": "z", "let_frequency": 2, "let_relation": "at least"},
         "zig zag", "zebra"),
        ("length_constraints:number_words", {"num_words": 3, "relation": "at most"},
         "two words", "this has too many words"),
        ("length_constraints:number_sentences", {"num_sentences": 2, "relation": "exactly"},
         "One. Two.", "One. Two. Three."),
        ("length_constraints:number_paragraphs", {"num_paragraphs": 2},
         "first\n\nsecond", "only one"),
        ("detectable_content:number_placeholders", {"num_placeholders": 1},
         "Dear [name], hi", "Dear friend"),
        ("detectable_content:postscript", {"postscript_marker": "P.S."},
         "Bye.\nP.S. hello", "Bye."),
        ("detectable_format:number_bullet_lists", {"num_bullets": 2},
         "* one\n* two", "* only"),
        ("detectable_format:constrained_response", {},
         "My answer is yes.", "Probably."),
        ("detectable_format:json_format", {},
         '{"a": 1}', "not json"),
        ("detectable_format:title", {},
         "<<My Title>>\ncontent", "no title"),
        ("combination:repeat_prompt", {"prompt_to_repeat": "Say hi"},
         "Say hi — ok, hi!", "hi!"),
        ("combination:two_responses", {},
         "first answer\n******\nsecond answer", "only one answer"),
        ("startend:end_checker", {"end_phrase": "the end"},
         "story... the end", "story... fin"),
        ("startend:quotation", {},
         '"quoted fully"', "not quoted"),
        ("change_case:english_capital", {},
         "ALL CAPS HERE", "Not all caps"),
        ("change_case:english_lowercase", {},
         "all lower here", "Not Lower"),
        ("change_case:capital_word_frequency", {"capital_frequency": 2, "capital_relation": "at least"},
         "WE ARE loud", "only ONE"),
        ("punctuation:no_comma", {},
         "no commas here", "one, comma"),
    ],
)
def test_checkers(inst, kw, good, bad):
    assert ifeval.evaluate_instructions(good, [inst], [kw]) == [True]
    assert ifeval.evaluate_instructions(bad, [inst], [kw]) == [False]


def test_loose_protocol_strips_noise():
    inst = ["change_case:english_lowercase"]
    noisy = "Sure! Here you go:\nall lower text"
    assert ifeval.evaluate_instructions(noisy, inst, [{}], strict=True) == [False]
    assert ifeval.evaluate_instructions(noisy, inst, [{}], strict=False) == [True]


def test_ifeval_score_aggregation():
    samples = [
        {
            "response": "my answer is yes.",
            "instruction_id_list": [
                "detectable_format:constrained_response",
                "change_case:english_lowercase",
            ],
            "kwargs": [{}, {}],
        },
        {
            "response": "NO COMMAS",
            "instruction_id_list": ["punctuation:no_comma", "startend:quotation"],
            "kwargs": [{}, {}],
        },
    ]
    out = ifeval.ifeval_score(samples)
    assert out["prompt_level_accuracy"] == 0.5
    assert out["instruction_level_accuracy"] == 0.75


def test_mcq_extraction():
    assert extract_mcq_answer("The answer is (B).") == "B"
    assert extract_mcq_answer("I choose C because...") == "C"
    assert extract_mcq_answer("A) is correct") == "A"
    assert extract_mcq_answer("D") == "D"
    assert extract_mcq_answer("no letters here") is None


def test_voicebench_metrics():
    s = EvalSample(0, "q", "B", "The answer is B.")
    assert voicebench_mcq(s, {}).score == 1.0
    s2 = EvalSample(0, "q", "Paris||City of Light", "It's in Paris, France.")
    assert voicebench_qa(s2, {}).score == 1.0
    s3 = EvalSample(0, "how to do harm", "", "I can't help with that request.")
    assert voicebench_harm(s3, {}).score == 1.0
    s4 = EvalSample(
        0, "q",
        '{"instruction_id_list": ["punctuation:no_comma"], "kwargs": [{}]}',
        "no commas at all",
    )
    assert voicebench_ifeval(s4, {}).score == 1.0


def test_dormant_reference_families():
    """The four checker families the reference keeps commented out in its
    registry (instructions_registry.py:43-64) are active here."""
    from ultravox_tpu.evaluation.ifeval import evaluate_instructions

    def one(inst, kw, text):
        return evaluate_instructions(text, [inst], [kw])[0]

    assert one(
        "keywords:key_sentences",
        {"key_sentences": ["The sky is blue.", "Grass is green."],
         "num_sentences": 1},
        "The sky is blue. Roses are red.",
    )
    assert not one(
        "keywords:key_sentences",
        {"key_sentences": ["The sky is blue.", "Grass is green."],
         "num_sentences": 1},
        "The sky is blue. Grass is green.",  # 2 present, need exactly 1
    )
    assert one(
        "detectable_format:rephrase",
        {"original_message": "I want to *eat pizza* tonight."},
        "I want to *have sushi* tonight.",
    )
    assert not one(
        "detectable_format:rephrase",
        {"original_message": "I want to *eat pizza* tonight."},
        "We want to *have sushi* tonight.",  # changed outside the span
    )
    assert one(
        "detectable_content:rephrase_paragraph",
        {"original_paragraph": "the cat sat on the mat", "low": 2,
         "high": 4},
        "a cat lay on a rug",  # shares: cat, on -> 2
    )
    assert not one(
        "detectable_content:rephrase_paragraph",
        {"original_paragraph": "the cat sat on the mat", "low": 2,
         "high": 4},
        "the cat sat on the mat",  # 6 common > high
    )
    assert one(
        "multi-turn:constrained_start",
        {"starter": "My answer is"},
        "Sure.\nMy answer is yes.",
    )
    assert not one(
        "multi-turn:constrained_start",
        {"starter": "My answer is"},
        "The answer is yes.",
    )
