"""Chat template auto-parser: differential analysis of REAL model
templates (reference's models/templates/*.jinja as test data) + batch and
streaming round-trip parsing (chat-auto-parser-generator.cpp /
chat-peg-parser.cpp analogues)."""
import json
from pathlib import Path

import pytest

from ik_llama_cpp_tpu.runtime.chat_autoparser import (
    StreamParser, analyze_template, parse_auto)

TDIR = Path("/root/reference/models/templates")

CASES = [
    # (template, sample generation, want_reasoning, want_content, want_calls)
    ("Qwen-Qwen3-0.6B.jinja",
     '<think>Let me see.</think>Sure!\n<tool_call>\n'
     '{"name": "get_weather", "arguments": {"city": "Paris"}}\n</tool_call>',
     "Let me see.", "Sure!", [("get_weather", {"city": "Paris"})]),
    ("NousResearch-Hermes-3-Llama-3.1-8B-tool_use.jinja",
     '<tool_call>\n{"name": "search", "arguments": {"q": "cats"}}\n'
     '</tool_call>',
     "", "", [("search", {"q": "cats"})]),
    ("Kimi-K2-Thinking.jinja",
     '<think>hmm</think>Okay.<|tool_calls_section_begin|>'
     '<|tool_call_begin|>functions.get_weather:0'
     '<|tool_call_argument_begin|>{"city": "Paris"}<|tool_call_end|>'
     '<|tool_calls_section_end|>',
     "hmm", "Okay.", [("get_weather", {"city": "Paris"})]),
    ("Qwen3-Coder.jinja",
     'Sure.\n<tool_call>\n<function=get_weather>\n<parameter=city>\n'
     'Paris\n</parameter>\n</function>\n</tool_call>',
     "", "Sure.", [("get_weather", {"city": "Paris"})]),
    # GLM-4.7's generation prompt ends INSIDE <think> (forced-open):
    # realistic output starts with reasoning and closes it mid-stream
    ("GLM-4.7-Flash.jinja",
     'I will call.</think>Done.<tool_call>get_weather<arg_key>city'
     '</arg_key><arg_value>Paris</arg_value></tool_call>',
     "I will call.", "Done.", [("get_weather", {"city": "Paris"})]),
    ("Mistral-Small-3.2-24B-Instruct-2506.jinja",
     '[TOOL_CALLS]get_weather[CALL_ID]abc123[ARGS]{"city": "Paris"}',
     "", "", [("get_weather", {"city": "Paris"})]),
]


@pytest.mark.skipif(not TDIR.exists(), reason="template corpus unavailable")
@pytest.mark.parametrize("tname,sample,wr,wc,wcalls",
                         CASES, ids=[c[0].split(".")[0][:24] for c in CASES])
def test_roundtrip_parse(tname, sample, wr, wc, wcalls):
    an = analyze_template((TDIR / tname).read_text())
    r, c, calls = parse_auto(sample, an)
    assert r == wr
    assert c == wc
    got = [(t.name, json.loads(t.arguments)) for t in calls]
    assert got == wcalls


@pytest.mark.skipif(not TDIR.exists(), reason="template corpus unavailable")
@pytest.mark.parametrize("tname,sample,wr,wc,wcalls",
                         CASES, ids=[c[0].split(".")[0][:24] for c in CASES])
@pytest.mark.parametrize("chunk", [1, 3, 7])
def test_streaming_matches_batch(tname, sample, wr, wc, wcalls, chunk):
    """Chunked streaming must produce the same reasoning/content/calls as
    batch parsing regardless of where deltas split."""
    an = analyze_template((TDIR / tname).read_text())
    sp = StreamParser(an)
    events = []
    for i in range(0, len(sample), chunk):
        events += sp.feed(sample[i:i + chunk])
    events += sp.finish()
    r = "".join(p for k, p in events if k == "reasoning").strip()
    c = "".join(p for k, p in events if k == "content").strip()
    calls = [(p.name, json.loads(p.arguments))
             for k, p in events if k == "tool_call"]
    assert r == wr
    assert c == wc
    assert calls == wcalls


@pytest.mark.skipif(not TDIR.exists(), reason="template corpus unavailable")
def test_forced_open_reasoning():
    """deepseek-r1-style: the prompt ends inside <think>; output starts
    with reasoning and closes it mid-stream."""
    # qwen3 template is not forced-open; synthesize a forced-open variant
    src = ("{% for m in messages %}<|im_start|>{{ m.role }}\n{{ m.content }}"
           "<|im_end|>\n{% endfor %}{% if add_generation_prompt %}"
           "<|im_start|>assistant\n<think>{% endif %}")
    an = analyze_template(src)
    assert an.reasoning_forced_open
    r, c, _ = parse_auto("step one</think>the answer", an)
    assert r == "step one"
    assert c == "the answer"
    sp = StreamParser(an)
    ev = sp.feed("step one</think>the answer") + sp.finish()
    assert ("reasoning", "step one") == ev[0]


@pytest.mark.skipif(not TDIR.exists(), reason="template corpus unavailable")
def test_multiple_calls():
    an = analyze_template((TDIR / "Qwen-Qwen3-0.6B.jinja").read_text())
    text = ('<tool_call>\n{"name": "a", "arguments": {"x": 1}}\n</tool_call>'
            '\n<tool_call>\n{"name": "b", "arguments": {"y": 2}}\n'
            '</tool_call>')
    _, _, calls = parse_auto(text, an)
    assert [(t.name, json.loads(t.arguments)) for t in calls] == \
        [("a", {"x": 1}), ("b", {"y": 2})]


@pytest.mark.skipif(not TDIR.exists(), reason="template corpus unavailable")
def test_analysis_coverage_across_corpus():
    """The analyzer should discover a tool syntax for most templates that
    support tools, without crashing on any of them."""
    total = with_tools = 0
    for f in sorted(TDIR.glob("*.jinja")):
        src = f.read_text()
        total += 1
        an = analyze_template(src)     # must never raise
        if an.tool_format != "none":
            with_tools += 1
    assert total > 20
    assert with_tools >= total * 0.5, f"{with_tools}/{total}"
