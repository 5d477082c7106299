"""Unit tests for the Responses-API conversion + output builders
(server/responses.py; reference: server-chat.cpp:6 conversion,
server-task.cpp:236/473/544 builders, codex_responses.feature cases)."""
import json

import pytest

from ik_llama_cpp_tpu.server.responses import (
    ResponsesStream, build_response, new_ids, responses_to_chatcmpl, sse)


def test_string_input_and_instructions():
    out = responses_to_chatcmpl({
        "input": "hello", "instructions": "be terse",
        "max_output_tokens": 7, "temperature": 0.5, "store": True})
    assert out["messages"] == [
        {"role": "system", "content": "be terse"},
        {"role": "user", "content": "hello"}]
    assert out["max_tokens"] == 7
    assert out["temperature"] == 0.5
    assert "store" not in out and "input" not in out \
        and "max_output_tokens" not in out


def test_input_items_user_and_assistant():
    out = responses_to_chatcmpl({"input": [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "type": "message", "status": "completed",
         "content": [{"type": "output_text", "text": "yo"}]},
        {"role": "user",
         "content": [{"type": "input_text", "text": "more"},
                     {"type": "input_image", "image_url": "data:x"}]},
    ]})
    m = out["messages"]
    assert m[0] == {"role": "user",
                    "content": [{"type": "text", "text": "hi"}]}
    assert m[1]["role"] == "assistant"
    assert m[1]["content"] == [{"type": "text", "text": "yo"}]
    assert "status" not in m[1] and "type" not in m[1]
    assert m[2]["content"][1] == {"type": "image_url",
                                  "image_url": {"url": "data:x"}}


def test_function_call_roundtrip():
    out = responses_to_chatcmpl({"input": [
        {"type": "reasoning", "summary": [],
         "content": [{"type": "reasoning_text", "text": "hmm"}]},
        {"type": "function_call", "call_id": "c1", "name": "get_time",
         "arguments": "{}"},
        {"type": "function_call_output", "call_id": "c1",
         "output": "12:00"},
        {"type": "function_call_output", "call_id": "c1",
         "output": [{"type": "input_text", "text": "noon"}]},
    ]})
    m = out["messages"]
    # reasoning placeholder folded into the tool-call message
    assert m[0]["role"] == "assistant"
    assert m[0]["reasoning_content"] == "hmm"
    assert m[0]["tool_calls"][0]["function"]["name"] == "get_time"
    assert m[1] == {"role": "tool", "tool_call_id": "c1", "content": "12:00"}
    assert m[2]["content"] == [{"type": "text", "text": "noon"}]


def test_orphan_reasoning_dropped():
    out = responses_to_chatcmpl({"input": [
        {"role": "user", "content": "q"},
        {"type": "reasoning", "summary": [],
         "content": [{"type": "reasoning_text", "text": "hmm"}]},
    ]})
    assert len(out["messages"]) == 1


def test_tools_conversion_skips_builtins():
    out = responses_to_chatcmpl({"input": "x", "tools": [
        {"type": "web_search"},
        {"type": "function", "name": "f", "description": "d",
         "parameters": {"type": "object"}},
    ]})
    tools = out["tools"]
    assert len(tools) == 1
    assert tools[0]["type"] == "function"
    assert tools[0]["function"]["name"] == "f"
    assert tools[0]["function"]["strict"] is True


def test_probe_empty_input_accepted():
    # codex_responses.feature: probe with empty input + max_output_tokens=1
    out = responses_to_chatcmpl({"input": [], "max_output_tokens": 1})
    assert out["messages"] == [] and out["max_tokens"] == 1


@pytest.mark.parametrize("body,msg", [
    ({}, "input"),
    ({"input": "x", "previous_response_id": "r1"}, "previous_response_id"),
    ({"input": 5}, "string or array"),
    ({"input": [{"role": "user",
                 "content": [{"type": "input_file"}]}]}, "input_file"),
    ({"input": [{"role": "user",
                 "content": [{"type": "bogus"}]}]}, "must be one of"),
])
def test_conversion_errors(body, msg):
    with pytest.raises(ValueError, match=msg):
        responses_to_chatcmpl(body)


def test_build_response_shape():
    ids = new_ids()
    r = build_response(ids, "m", reasoning="think", content="hi",
                       tool_calls=[{"id": "c1", "name": "f",
                                    "arguments": "{}"}],
                       n_prompt=3, n_decoded=2)
    assert r["object"] == "response" and r["status"] == "completed"
    kinds = [o["type"] for o in r["output"]]
    assert kinds == ["reasoning", "message", "function_call"]
    assert r["output"][1]["content"][0]["text"] == "hi"
    assert r["output"][2]["call_id"] == "fc_c1"
    assert r["usage"]["total_tokens"] == 5


def test_stream_event_sequence():
    ids = new_ids()
    st = ResponsesStream(ids, "m")
    evs = st.open_events()
    evs += st.delta_events("he")
    evs += st.delta_events("llo")
    evs += st.final_events(content="hello", n_prompt=1, n_decoded=2)
    names = [e["event"] for e in evs]
    assert names == [
        "response.created", "response.in_progress",
        "response.output_item.added", "response.content_part.added",
        "response.output_text.delta", "response.output_text.delta",
        "response.output_text.done", "response.content_part.done",
        "response.output_item.done", "response.completed"]
    done = evs[-1]["data"]["response"]
    assert done["usage"]["total_tokens"] == 3
    wire = sse(evs[0]).decode()
    assert wire.startswith("event: response.created\ndata: {")
    assert wire.endswith("\n\n")
    json.loads(wire.split("data: ", 1)[1])


def test_assistant_plain_string_content():
    """Prior assistant turns replayed as plain strings (valid OpenAI shape)
    must convert, not 400 (regression: _as_parts turned them into
    input_text parts the assistant branch rejected)."""
    out = responses_to_chatcmpl({"input": [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "earlier reply"},
        {"role": "user", "content": "again"}]})
    assert out["messages"][1] == {"role": "assistant",
                                  "content": "earlier reply"}


def test_reasoning_non_dict_content_is_valueerror():
    """A malformed reasoning content entry must raise ValueError (-> 400),
    not AttributeError (-> 500)."""
    with pytest.raises(ValueError, match="reasoning item requires"):
        responses_to_chatcmpl({"input": [
            {"type": "reasoning", "summary": [], "content": ["x"]}]})
