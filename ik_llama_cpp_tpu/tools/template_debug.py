"""Chat-template debugging CLI — examples/parser (template-analysis /
debug-template-parser) analogue.

Runs the differential template analysis on a model's (or a file's) jinja
chat template, prints the discovered reasoning markers and tool-call
syntax, renders a sample conversation, and round-trips a synthetic
assistant message through the auto-parser.

Usage:
  python -m ik_llama_cpp_tpu.tools.template_debug -m model.gguf
  python -m ik_llama_cpp_tpu.tools.template_debug --template-file t.jinja \
      --parse "some assistant output"
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", help="GGUF with a chat template")
    ap.add_argument("--template-file", help="raw jinja template file")
    ap.add_argument("--parse", help="assistant output to run the parser on")
    ap.add_argument("--render", action="store_true",
                    help="render a sample tool-call conversation")
    args = ap.parse_args(argv)

    if args.template_file:
        src = open(args.template_file).read()
    elif args.model:
        from ..gguf.reader import load_gguf
        src = load_gguf(args.model).metadata.get("tokenizer.chat_template")
        if not src:
            print("model has no tokenizer.chat_template", file=sys.stderr)
            return 1
    else:
        src = sys.stdin.read()

    from ..runtime.chat_autoparser import analyze_template, parse_auto
    an = analyze_template(src)
    print("template analysis (chat-auto-parser-generator analogue):")
    for k, v in vars(an).items():
        print(f"  {k:22s} = {v!r}")

    if args.render:
        from ..runtime.chat import apply_chat_template
        msgs = [{"role": "user", "content": "What is the weather?"},
                {"role": "assistant", "content": "",
                 "tool_calls": [{"id": "call_0", "type": "function",
                                 "function": {"name": "get_weather",
                                              "arguments": '{"city": "Paris"}'}}]},
                {"role": "tool", "tool_call_id": "call_0",
                 "content": "sunny"}]
        tools = [{"type": "function",
                  "function": {"name": "get_weather", "description": "",
                               "parameters": {"type": "object",
                                              "properties": {"city": {"type": "string"}}}}}]
        print("\nrendered sample conversation:")
        print(apply_chat_template(msgs, template=src, tools=tools))

    if args.parse:
        reasoning, content, calls = parse_auto(args.parse, an)
        print("\nparse result:")
        print(f"  reasoning = {reasoning!r}")
        print(f"  content   = {content!r}")
        for c in calls:
            print(f"  tool_call = {c.name}({c.arguments})")
        if not calls:
            print("  tool_call = (none)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
