"""JSON-schema -> GBNF converter — analogue of common/json-schema-to-grammar.cpp.

Supports: object (properties/required/additionalProperties=false), array
(items, minItems/maxItems small), string (enum/const), number, integer,
boolean, null, anyOf/oneOf, $ref (local #/definitions and #/$defs).
"""
from __future__ import annotations

import json
import re

SPACE = 'space ::= " "?'
PRIMITIVES = {
    "boolean": 'boolean ::= ("true" | "false") space',
    "null": 'null ::= "null" space',
    "number": 'number ::= ("-"? ([0-9] | [1-9] [0-9]*)) ("." [0-9]+)? ([eE] [-+]? [0-9]+)? space',
    "integer": 'integer ::= ("-"? ([0-9] | [1-9] [0-9]*)) space',
    "string": r'''string ::= "\"" (
        [^"\\] | "\\" (["\\/bfnrt] | "u" [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F])
      )* "\"" space''',
    "value": 'value ::= object | array | string | number | boolean | null',
    "object": r'object ::= "{" space ( string ":" space value ("," space string ":" space value)* )? "}" space',
    "array": r'array ::= "[" space ( value ("," space value)* )? "]" space',
}


def _lit(s: str) -> str:
    out = s.replace("\\", "\\\\").replace('"', '\\"')
    return f'"{out}"'


class SchemaConverter:
    def __init__(self, schema: dict):
        self.schema = schema
        self.rules: dict[str, str] = {"space": SPACE}
        self.used: set[str] = set()

    def _prim(self, name: str) -> str:
        if name not in self.rules:
            self.rules[name] = PRIMITIVES[name]
            if name in ("value", "object", "array"):
                for dep in ("object", "array", "string", "number", "boolean",
                            "null", "value"):
                    if dep not in self.rules:
                        self.rules[dep] = PRIMITIVES[dep]
        return name

    def _resolve_ref(self, ref: str) -> dict:
        node = self.schema
        for part in ref.lstrip("#/").split("/"):
            node = node[part]
        return node

    def _name(self, base: str) -> str:
        base = re.sub(r"[^a-zA-Z0-9-]+", "-", base) or "rule"
        name = base
        i = 0
        while name in self.used:
            i += 1
            name = f"{base}{i}"
        self.used.add(name)
        return name

    def visit(self, schema: dict, name: str) -> str:
        if "$ref" in schema:
            return self.visit(self._resolve_ref(schema["$ref"]),
                              name or schema["$ref"].split("/")[-1])
        if "const" in schema:
            rn = self._name(name or "const")
            self.rules[rn] = f"{rn} ::= {_lit(json.dumps(schema['const']))} space"
            return rn
        if "enum" in schema:
            rn = self._name(name or "enum")
            alts = " | ".join(_lit(json.dumps(v)) for v in schema["enum"])
            self.rules[rn] = f"{rn} ::= ({alts}) space"
            return rn
        if "anyOf" in schema or "oneOf" in schema:
            subs = schema.get("anyOf") or schema.get("oneOf")
            rn = self._name(name or "any")
            alts = " | ".join(self.visit(s, f"{rn}-{i}") for i, s in enumerate(subs))
            self.rules[rn] = f"{rn} ::= {alts}"
            return rn
        t = schema.get("type")
        if t == "object" and "properties" in schema:
            rn = self._name(name or "obj")
            props = list(schema["properties"].items())
            required = set(schema.get("required", [p for p, _ in props]))
            parts = ['"{" space']
            first = True
            for pname, pschema in props:
                sub = self.visit(pschema, f"{rn}-{pname}")
                kv = f'{_lit(json.dumps(pname))} ":" space {sub}'
                if pname in required:
                    if not first:
                        parts.append('"," space')
                    parts.append(kv)
                    first = False
                else:
                    sep = '"," space ' if not first else ""
                    parts.append(f"({sep}{kv})?")
                    if first:
                        first = False
            parts.append('"}" space')
            self.rules[rn] = f"{rn} ::= " + " ".join(parts)
            return rn
        if t == "array":
            rn = self._name(name or "arr")
            item = self.visit(schema.get("items", {}), f"{rn}-item")
            self.rules[rn] = (f'{rn} ::= "[" space ({item} ("," space {item})*)? '
                              f'"]" space')
            return rn
        if t in ("string", "number", "integer", "boolean", "null"):
            return self._prim(t)
        return self._prim("value")

    def grammar(self) -> str:
        root = self.visit(self.schema, "root0")
        lines = [f"root ::= {root}"]
        lines.extend(self.rules.values())
        return "\n".join(lines)


def json_schema_to_gbnf(schema: dict | str) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return SchemaConverter(schema).grammar()
