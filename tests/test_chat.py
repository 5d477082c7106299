"""Chat template + tool-call parser tests — analogue of reference
tests/test-chat.cpp, test-chat-template.cpp, test-function-calls.cpp."""
import json

from ik_llama_cpp_tpu.runtime.chat import (
    FALLBACK_TEMPLATES, apply_chat_template, detect_template_name,
    parse_tool_calls, split_reasoning)

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "Bye"},
]


def test_chatml():
    s = apply_chat_template(MSGS, template="chatml")
    assert s.count("<|im_start|>") == 5       # 4 msgs + generation prompt
    assert s.endswith("<|im_start|>assistant\n")


def test_llama3():
    s = apply_chat_template(MSGS, template="llama3")
    assert "<|start_header_id|>user<|end_header_id|>" in s
    assert s.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_gemma_maps_roles():
    s = apply_chat_template(MSGS, template="gemma")
    assert "<start_of_turn>model" in s
    assert "assistant" not in s


def test_all_fallbacks_render():
    for name in FALLBACK_TEMPLATES:
        s = apply_chat_template(MSGS, template=name)
        assert "Hi" in s and "Bye" in s, name


def test_jinja_template():
    tmpl = ("{% for m in messages %}<{{ m.role }}>{{ m.content }}</{{ m.role }}>"
            "{% endfor %}{% if add_generation_prompt %}<assistant>{% endif %}")
    s = apply_chat_template(MSGS, template=tmpl)
    assert s.startswith("<system>You are helpful.</system>")
    assert s.endswith("<assistant>")


def test_jinja_error_falls_back():
    s = apply_chat_template(MSGS, template="{{ unknown_fn() }}<|im_start|>")
    assert "Hi" in s                     # fell back to a named template


def test_content_parts_flattened():
    msgs = [{"role": "user",
             "content": [{"type": "text", "text": "part1 "},
                         {"type": "text", "text": "part2"}]}]
    s = apply_chat_template(msgs, template="chatml")
    assert "part1 part2" in s


def test_detect_template_name():
    assert detect_template_name("...<|im_start|>...") == "chatml"
    assert detect_template_name("...<|start_header_id|>...") == "llama3"
    assert detect_template_name("...<start_of_turn>...") == "gemma"
    assert detect_template_name("[INST]...<<SYS>>") == "llama2"
    assert detect_template_name("[INST]") == "mistral"
    assert detect_template_name(None) == "chatml"


def test_parse_hermes_tool_call():
    text = ('I will check.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}\n</tool_call>')
    content, calls = parse_tool_calls(text)
    assert content == "I will check."
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris"}


def test_parse_mistral_tool_calls():
    text = '[TOOL_CALLS][{"name": "f", "arguments": {"x": 1}}, {"name": "g", "arguments": {}}]'
    content, calls = parse_tool_calls(text)
    assert [c.name for c in calls] == ["f", "g"]
    assert content == ""


def test_parse_llama31_bare_json():
    text = '{"name": "search", "parameters": {"q": "llms"}}'
    content, calls = parse_tool_calls(text)
    assert calls and calls[0].name == "search"
    assert json.loads(calls[0].arguments) == {"q": "llms"}


def test_parse_function_tag():
    text = '<function=lookup>{"key": "v"}</function>'
    content, calls = parse_tool_calls(text)
    assert calls[0].name == "lookup"


def test_no_tool_calls_passthrough():
    content, calls = parse_tool_calls("Just a normal answer { not json }")
    assert calls == []
    assert "normal answer" in content


def test_split_reasoning():
    r, c = split_reasoning("<think>step 1\nstep 2</think>The answer is 4.")
    assert "step 1" in r
    assert c == "The answer is 4."


def test_split_reasoning_unterminated():
    r, c = split_reasoning("prefix<think>still thinking")
    assert "still thinking" in r
    assert c == "prefix"


def test_openai_wire_format():
    _, calls = parse_tool_calls('<tool_call>{"name": "f", "arguments": {}}</tool_call>')
    d = calls[0].to_openai()
    assert d["type"] == "function" and d["id"].startswith("call_")
    assert d["function"]["name"] == "f"
