"""HTTP server — OpenAI + Anthropic + llama.cpp-native endpoints over the
continuous-batching engine. Analogue of examples/server/server.cpp:2127-2174.

Endpoints: /health /props /metrics /v1/models /tokenize /detokenize
/completion /v1/completions /v1/chat/completions /v1/messages /slots

Run: python -m ik_llama_cpp_tpu.server --gguf model.gguf --port 8080
"""
from __future__ import annotations

import argparse
import asyncio
import json
import queue
import time
import uuid
from pathlib import Path

import numpy as np
from aiohttp import web

from ..runtime.chat import apply_chat_template, parse_tool_calls, split_reasoning
from ..runtime.generate import Runtime
from ..runtime.sampling import SamplerParams
from .engine import BatchEngine, Request, SlotState


def decode_wav(data: bytes):
    """Base64-decoded WAV bytes -> mono float32 16 kHz samples (the
    input_audio path; reference: miniaudio decode in mtmd-helper). Accepts
    PCM16 WAV; raw f32 little-endian blobs pass through unchanged."""
    import io
    import wave

    import numpy as np
    if data[:4] != b"RIFF":
        return np.frombuffer(data, np.float32).copy()
    with wave.open(io.BytesIO(data)) as w:
        n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width != 2:
        raise ValueError(f"only PCM16 WAV supported, got sample width {width}")
    samples = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    if rate != 16000:
        # linear resample to the whisper preprocessor's fixed 16 kHz
        n_out = int(round(len(samples) * 16000 / rate))
        x_old = np.linspace(0.0, 1.0, len(samples), endpoint=False)
        x_new = np.linspace(0.0, 1.0, n_out, endpoint=False)
        samples = np.interp(x_new, x_old, samples).astype(np.float32)
    return samples


def _sampler_from(body: dict, tok=None) -> SamplerParams:
    bias = {}
    lb = body.get("logit_bias")
    if isinstance(lb, dict):
        bias = {int(k): float(v) for k, v in lb.items()}
    elif isinstance(lb, list):        # native [[tok, bias|false], ...] form
        for item in lb:
            if isinstance(item, (list, tuple)) and len(item) == 2:
                bias[int(item[0])] = -101.0 if item[1] is False else float(item[1])
    kw = {}
    if "samplers" in body:
        s = body["samplers"]
        kw["samplers"] = tuple(s.split(";") if isinstance(s, str) else s)
    # DRY sequence breakers arrive as strings; matching works on token ids.
    # When DRY is enabled without explicit breakers, the reference's
    # defaults ('\n', ':', '"', '*') apply.
    brk = body.get("dry_sequence_breakers")
    if brk is None and float(body.get("dry_multiplier", 0.0)) > 0.0:
        from ..runtime.sampling import DEFAULT_DRY_BREAKERS
        brk = list(DEFAULT_DRY_BREAKERS)
    if brk and tok is not None:
        ids = []
        for s in brk if isinstance(brk, list) else [brk]:
            ids.extend(tok.encode(str(s), add_bos=False)
                       if hasattr(tok, "encode") else [])
        kw["dry_sequence_breaker_ids"] = tuple(ids)
    if body.get("ignore_eos") and tok is not None \
            and tok.eos_id is not None:
        bias[int(tok.eos_id)] = -101.0
    if body.get("penalize_nl") is False and tok is not None:
        nl = tok.encode("\n", add_bos=False)
        if nl:
            kw["penalize_nl"] = False
            kw["nl_token_id"] = int(nl[-1])
    return SamplerParams(
        temp=float(body.get("temperature", 0.8)),
        dynatemp_range=float(body.get("dynatemp_range", 0.0)),
        dynatemp_exponent=float(body.get("dynatemp_exponent", 1.0)),
        top_k=int(body.get("top_k", 40)),
        top_p=float(body.get("top_p", 0.95)),
        min_p=float(body.get("min_p", 0.05)),
        tfs_z=float(body.get("tfs_z", 1.0)),
        typical_p=float(body.get("typical_p", 1.0)),
        xtc_probability=float(body.get("xtc_probability", 0.0)),
        xtc_threshold=float(body.get("xtc_threshold", 0.1)),
        top_n_sigma=float(body.get("top_n_sigma", 0.0)),
        penalty_last_n=int(body.get("repeat_last_n", 64)),
        penalty_repeat=float(body.get("repeat_penalty", 1.0)),
        penalty_freq=float(body.get("frequency_penalty", 0.0)),
        penalty_present=float(body.get("presence_penalty", 0.0)),
        dry_multiplier=float(body.get("dry_multiplier", 0.0)),
        dry_base=float(body.get("dry_base", 1.75)),
        dry_allowed_length=int(body.get("dry_allowed_length", 2)),
        dry_penalty_last_n=int(body.get("dry_penalty_last_n", -1)),
        mirostat=int(body.get("mirostat", 0)),
        mirostat_tau=float(body.get("mirostat_tau", 5.0)),
        mirostat_eta=float(body.get("mirostat_eta", 0.1)),
        adaptive_target=float(body.get("adaptive_target", -1.0)),
        adaptive_decay=float(body.get("adaptive_decay", 0.9)),
        min_keep=max(1, int(body.get("min_keep", 1))),
        logit_bias=bias,
        **kw,
    )


def _n_probs_from(body: dict) -> int:
    """Top-logprob count: native n_probs, OpenAI completions `logprobs: N`,
    or OpenAI chat `logprobs: true` + `top_logprobs: N`."""
    if body.get("n_probs"):
        return int(body["n_probs"])
    lp = body.get("logprobs")
    if lp is True:
        return max(1, int(body.get("top_logprobs") or 1))
    if isinstance(lp, int) and not isinstance(lp, bool) and lp > 0:
        return int(lp)
    return 0


def _allowlist_fields(body: dict, srv) -> dict:
    """Allowlist Request kwargs: server CLI defaults with per-request
    overrides.  The reference overrides pieces (``allowlist_piece_array``)
    and the keyword delay (``allowlist_keyword_delay``) per request
    (server-context.cpp:1707-1717); we additionally accept full rule and
    keyword arrays (``allowlist_unicode_rules`` — array of arrays of rule
    strings — and ``allowlist_keywords``), closing its JSON-parsing TODO."""
    rules = srv.allow_rules
    body_rules = body.get("allowlist_unicode_rules")
    if isinstance(body_rules, list):
        from ..runtime.allowlist import parse_rule
        rules = [[parse_rule(str(r)) for r in rs]
                 for rs in body_rules if isinstance(rs, list)]
    kws = srv.allow_kws
    body_kws = body.get("allowlist_keywords")
    if isinstance(body_kws, list):
        kws = [str(k) for k in body_kws]
    pieces = srv.allow_pieces
    body_pieces = body.get("allowlist_piece_array")
    if isinstance(body_pieces, list):
        pieces = [str(p) for p in body_pieces if isinstance(p, str)]
    return {
        "allow_rules": rules,
        "allow_pieces": pieces,
        "allow_kws": kws,
        "allow_kw_delay": int(body.get("allowlist_keyword_delay",
                                       srv.allow_kw_delay)),
    }


def _grammar_from(body: dict) -> str | None:
    """GBNF grammar text from the request: native ``grammar`` /
    ``json_schema`` fields (server.cpp params_from_json_cmpl) or the OpenAI
    ``response_format`` object (json_object / json_schema types).

    A ``grammar_kind`` of regex/lark/json routes ``grammar`` through the
    llguidance-analogue adapter (runtime/llg.py; common/llguidance.cpp) —
    kinds are normalized to GBNF here so every downstream path (lazy
    triggers, allowlists, spec rollback) works unchanged."""
    if body.get("grammar"):
        kind = str(body.get("grammar_kind") or "gbnf")
        if kind not in ("gbnf", "grammar"):
            from ..runtime.llg import to_gbnf
            return to_gbnf(kind, str(body["grammar"]))
        return str(body["grammar"])
    if body.get("json_schema") is not None:
        from ..runtime.json_schema import json_schema_to_gbnf
        return json_schema_to_gbnf(body["json_schema"])
    rf = body.get("response_format")
    if isinstance(rf, dict):
        t = rf.get("type")
        if t in ("json_object", "json_schema"):
            from ..runtime.json_schema import json_schema_to_gbnf
            js = rf.get("json_schema", rf)
            schema = js.get("schema") if isinstance(js, dict) else None
            return json_schema_to_gbnf(schema if schema is not None else {})
    return None


class Server:
    def __init__(self, engine: BatchEngine, model_name: str = "model",
                 api_key: str | None = None):
        self.engine = engine
        self.rt = engine.rt
        self.model_name = model_name
        self.api_key = api_key
        # template auto-parser (chat-auto-parser-generator.cpp analogue):
        # differential analysis of the model's jinja template, reused for
        # batch + streaming reasoning/tool-call extraction
        self.chat_analysis = None
        tmpl = getattr(self.rt.tokenizer, "chat_template", None)
        if tmpl and ("{{" in tmpl or "{%" in tmpl):
            try:
                from ..runtime.chat_autoparser import analyze_template
                self.chat_analysis = analyze_template(tmpl)
            except Exception:
                self.chat_analysis = None

        _CORS = {
            "Access-Control-Allow-Origin": "*",
            "Access-Control-Allow-Methods": "GET, POST, OPTIONS",
            "Access-Control-Allow-Headers":
                "Content-Type, Authorization, x-api-key, anthropic-version",
        }

        @web.middleware
        async def auth(request, handler):
            # CORS preflight + headers on every response (the reference
            # sets Access-Control-Allow-Origin * per handler and ships a
            # CORS proxy, server-cors-proxy.h)
            if request.method == "OPTIONS":
                return web.Response(status=204, headers=_CORS)
            # /health stays open (load-balancer probes), like the reference
            if self.api_key and request.path != "/health":
                got = request.headers.get("Authorization", "")
                got = got.removeprefix("Bearer ").strip() or \
                    request.headers.get("x-api-key", "")
                if got != self.api_key:
                    return web.json_response(
                        {"error": {"message": "invalid api key",
                                   "type": "authentication_error"}},
                        status=401, headers=_CORS)
            resp = await handler(request)
            try:
                resp.headers.update(_CORS)
            except Exception:
                pass            # streamed responses already prepared
            return resp

        self.app = web.Application(middlewares=[auth])
        r = self.app.router
        r.add_get("/", self.webui)
        r.add_get("/health", self.health)
        r.add_get("/props", self.props)
        r.add_get("/v1/props", self.props_simple)
        r.add_get("/version", self.version)
        r.add_get("/metrics", self.metrics)
        r.add_get("/v1/models", self.models)
        r.add_get("/models", self.models)
        r.add_get("/slots", self.slots)
        r.add_get("/slots/list", self.slots_list)
        r.add_get("/list", self.saved_prompts_list)
        r.add_post("/delete_prompt", self.delete_prompt)
        r.add_post("/rename_prompt", self.rename_prompt)
        r.add_post("/load", self.db_load)
        r.add_post("/save", self.db_save)
        r.add_post("/rename", self.db_rename)
        r.add_post("/all", self.db_all)
        r.add_post("/sessions", self.db_sessions)
        r.add_get("/sessions", self.db_sessions)
        r.add_post("/delete", self.db_delete)
        r.add_get("/vacuum", self.db_vacuum)
        r.add_get("/control-vectors", self.cvec_list)
        r.add_post("/control-vectors/load", self.cvec_load)
        r.add_post("/control-vectors/unload", self.cvec_unload)
        r.add_post("/control-vectors/apply", self.cvec_apply)
        r.add_post("/profiler/start", self.profiler_start)
        r.add_post("/profiler/stop", self.profiler_stop)
        r.add_post("/tokenize", self.tokenize)
        r.add_post("/detokenize", self.detokenize)
        r.add_post("/completion", self.completion)
        r.add_post("/completions", self.completion)
        r.add_post("/v1/completions", self.oai_completions)
        r.add_post("/v1/chat/completions", self.oai_chat)
        r.add_post("/chat/completions", self.oai_chat)
        r.add_post("/v1/responses", self.oai_responses)
        r.add_post("/responses", self.oai_responses)
        r.add_post("/v1/messages", self.anthropic_messages)
        r.add_post("/v1/messages/count_tokens", self.anthropic_count_tokens)
        r.add_post("/embedding", self.embeddings)
        r.add_post("/embeddings", self.embeddings)
        r.add_post("/v1/embeddings", self.oai_embeddings)
        r.add_post("/rerank", self.rerank)
        r.add_post("/v1/rerank", self.rerank)
        r.add_post("/infill", self.infill)
        r.add_post("/apply-template", self.apply_template)
        r.add_get("/lora-adapters", self.lora_list)
        r.add_post("/lora-adapters", self.lora_set)
        r.add_post("/slots/{id}", self.slot_action)
        self.loras: list = []
        self.clip = None            # ClipEncoder when --mmproj given
        self.audio = None           # AudioEncoder when the mmproj has one
        self._mm_lock = asyncio.Lock()
        self.slot_save_path = "/tmp"
        # control_vectors: [{"path","scale","layer_start","layer_end",
        #                    "applied"}] (server-context.cpp:3081 task state)
        self.control_vectors: list[dict] = []
        self.session_db = None      # SessionDB when --sql-save-file given
        self._profile_dir = None    # active jax.profiler capture dir
        # unicode-script allowlist defaults (--allowlist-unicode-rule /
        # --allowlist-pieces / --allowlist-keyword[-delay]); per-request
        # fields may override pieces/delay (and, beyond the reference's
        # CLI-only rules, full rule/keyword arrays)
        self.allow_rules: list = []     # list of rulesets of parsed tuples
        self.allow_pieces: list = []
        self.allow_kws: list = []
        self.allow_kw_delay: int = 0
        # expiring-logit-bias rule text (--expiring-logit-bias-file);
        # per-request expiring_logit_bias overrides
        self.expiring_logit_bias = None

    # ------------------------------------------------------------ helpers
    async def _run(self, prompt_ids, body: dict, stream: bool, on_token=None,
                   req_out: dict | None = None):
        q: queue.Queue = queue.Queue()
        from ..runtime.grammar import Grammar, GBNFParseError
        try:
            g_text = _grammar_from(body)
            if g_text is not None:
                Grammar(g_text)     # validate before admitting -> clean 400
        except (GBNFParseError, ValueError, KeyError) as e:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": {
                    "message": f"invalid grammar/schema: {e}",
                    "type": "invalid_request_error"}}),
                content_type="application/json")
        req = Request(
            prompt_ids=prompt_ids,
            n_predict=int(body.get("n_predict", body.get("max_tokens", 128))),
            sampler=_sampler_from(body, tok=self.rt.tokenizer),
            seed=int(body.get("seed", int(time.time() * 1000) % 2**31)),
            stop=body.get("stop", []) or [],
            reasoning_budget=int(body.get(
                "reasoning_budget", body.get("reasoning_budget_tokens", -1))),
            grammar=g_text,
            grammar_lazy=bool(body.get("grammar_lazy", False)),
            grammar_triggers=[
                t.get("value", "") if isinstance(t, dict) else str(t)
                for t in body.get("grammar_triggers") or []],
            n_probs=_n_probs_from(body),
            n_keep=int(body.get("n_keep", -1)),
            n_discard=int(body.get("n_discard", -1)),
            banned_strings=[str(s).lower()
                            for s in body.get("banned_strings") or [] if s],
            banned_regex=[str(s) for s in body.get("banned_regex") or []
                          if s],
            banned_regex_ci=[str(s)
                             for s in body.get("banned_regex_ci") or [] if s],
            banned_bias=float(body.get("banned_bias", -999.0)),
            banned_n=int(body.get("banned_n", 1)),
            banbuffer=int(body.get("banbuffer_size", 0)),
            rewind_count_max=int(body.get("rewind_count_max", -1)),
            saturate_predict=bool(body.get("saturate_predict", False)),
            post_sampling_probs=bool(body.get("post_sampling_probs", False)),
            cache_prompt=bool(body.get("cache_prompt", True)),
            reasoning_start_tag=str(
                body.get("reasoning_budget_start_tag") or "<think>"),
            reasoning_end_tag=str(
                body.get("reasoning_budget_end_tag") or "</think>"),
            reasoning_message=str(
                body.get("reasoning_budget_message") or "\n"),
            stream_queue=q,
            expiring_logit_bias=body.get("expiring_logit_bias",
                                         self.expiring_logit_bias),
            **_allowlist_fields(body, self),
        )
        if req_out is not None:
            req_out["req"] = req
        self.engine.submit(req)
        loop = asyncio.get_event_loop()
        toks, text = [], []
        try:
            while True:
                tok, piece, done = await loop.run_in_executor(None, q.get)
                if tok >= 0:
                    toks.append(tok)
                    text.append(piece)
                if on_token and piece:
                    await on_token(piece, done)
                if done:
                    break
        except (asyncio.CancelledError, ConnectionResetError):
            # client disconnect: release the slot (SERVER_TASK_TYPE_CANCEL
            # semantics — the reference cancels the task and frees the slot)
            req.cancelled = True
            raise
        return toks, "".join(text)

    def _chat_prompt(self, messages: list[dict], tools: list | None = None) -> str:
        """Render the chat template from GGUF metadata (jinja) or fallback."""
        tmpl = getattr(self.rt.tokenizer, "chat_template", None)
        return apply_chat_template(messages, template=tmpl, tools=tools,
                                   add_generation_prompt=True)

    # ---------------------------------------------------------- endpoints
    async def webui(self, request):
        """Built-in chat WebUI (the reference ships a React SPA; ours is a
        dependency-free single file)."""
        html = (Path(__file__).parent / "webui.html").read_text()
        return web.Response(text=html, content_type="text/html")

    async def health(self, request):
        return web.json_response({"status": "ok"})

    async def props(self, request):
        cfg = self.rt.cfg
        return web.json_response({
            "model": self.model_name,
            "n_ctx": self.engine.capacity,
            "n_parallel": self.engine.n_slots,
            "arch": cfg.arch,
            "n_layer": cfg.n_layer,
            "n_embd": cfg.n_embd,
            "n_vocab": cfg.n_vocab,
            "chat_template": getattr(self.rt.tokenizer, "chat_template", None),
            "default_generation_settings": {
                "temperature": 0.8, "top_k": 40, "top_p": 0.95,
                "min_p": 0.05, "n_predict": 128,
            },
            "total_slots": self.engine.n_slots,
        })

    async def metrics(self, request):
        return web.Response(text=self.engine.metrics_text(),
                            content_type="text/plain")

    async def models(self, request):
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "created": int(time.time()), "owned_by": "ik_llama_cpp_tpu"}],
        })

    async def slots(self, request):
        return web.json_response([
            {"id": s.idx, "state": s.state.name,
             "n_past": s.n_past, "n_decoded": s.n_decoded}
            for s in self.engine.slots])

    async def tokenize(self, request):
        body = await request.json()
        ids = self.rt.tokenizer.encode(body.get("content", ""),
                                       add_bos=bool(body.get("add_special", False)))
        if body.get("with_pieces"):
            # reference /tokenize?with_pieces: [{id, piece}] rows
            # (server.cpp handle_tokenize)
            toks = [{"id": int(t), "piece": self.rt.tokenizer.decode([int(t)])}
                    for t in ids]
            return web.json_response({"tokens": toks})
        return web.json_response({"tokens": ids})

    async def detokenize(self, request):
        body = await request.json()
        return web.json_response(
            {"content": self.rt.tokenizer.decode(body.get("tokens", []))})

    async def embeddings(self, request):
        """Native /embedding(s): {"content": str|[str]} -> pooled vectors."""
        body = await request.json()
        content = body.get("content", body.get("input", ""))
        items = content if isinstance(content, list) else [content]
        pooling = body.get("pooling", "mean")
        loop = asyncio.get_event_loop()
        out = []
        for i, text in enumerate(items):
            ids = text if isinstance(text, list) else self.rt.tokenizer.encode(text)
            e = await loop.run_in_executor(None, self.rt.embed, ids, pooling)
            out.append({"index": i, "embedding": np.asarray(e).tolist()})
        return web.json_response(out if isinstance(content, list) else
                                 {"embedding": out[0]["embedding"]})

    async def oai_embeddings(self, request):
        """OpenAI-compatible /v1/embeddings."""
        body = await request.json()
        inputs = body.get("input", "")
        items = inputs if isinstance(inputs, list) else [inputs]
        loop = asyncio.get_event_loop()
        data, n_tok = [], 0
        for i, text in enumerate(items):
            ids = text if isinstance(text, list) else self.rt.tokenizer.encode(text)
            n_tok += len(ids)
            e = await loop.run_in_executor(None, self.rt.embed, ids, "mean")
            data.append({"object": "embedding", "index": i,
                         "embedding": np.asarray(e).tolist()})
        return web.json_response({
            "object": "list", "data": data, "model": self.model_name,
            "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok}})

    async def rerank(self, request):
        """/rerank: score documents against a query (embedding cosine
        similarity when the model has no classifier head — the generative
        fallback for examples/server's rerank endpoint)."""
        body = await request.json()
        query = body.get("query", "")
        docs = body.get("documents", [])
        top_n = int(body.get("top_n", len(docs)))
        loop = asyncio.get_event_loop()
        qids = self.rt.tokenizer.encode(query)
        qe = await loop.run_in_executor(None, self.rt.embed, qids, "mean")
        results = []
        for i, d in enumerate(docs):
            text = d if isinstance(d, str) else d.get("text", "")
            de = await loop.run_in_executor(
                None, self.rt.embed, self.rt.tokenizer.encode(text), "mean")
            results.append({"index": i,
                            "relevance_score": float(np.dot(qe, de))})
        results.sort(key=lambda r: -r["relevance_score"])
        return web.json_response({"model": self.model_name,
                                  "results": results[:top_n]})

    async def infill(self, request):
        """Fill-in-the-middle completion (examples/infill): builds the FIM
        prompt <pre>prefix<suf>suffix<mid> from the tokenizer's FIM ids."""
        body = await request.json()
        tok = self.rt.tokenizer
        if tok.fim_pre_id < 0 or tok.fim_suf_id < 0 or tok.fim_mid_id < 0:
            return web.json_response(
                {"error": "model has no fill-in-middle tokens"}, status=400)
        pre = tok.encode(body.get("input_prefix", ""), add_bos=False)
        suf = tok.encode(body.get("input_suffix", ""), add_bos=False)
        ids = ([tok.bos_id] if tok.bos_id >= 0 and tok.add_bos else []) + \
            [tok.fim_pre_id] + pre + [tok.fim_suf_id] + suf + [tok.fim_mid_id]
        toks, text = await self._run(ids, body, False)
        return web.json_response({"content": text,
                                  "tokens_predicted": len(toks)})

    async def slot_action(self, request):
        """POST /slots/{id}?action=save|restore|erase (server.cpp:2162)."""
        idx = int(request.match_info["id"])
        if not (0 <= idx < self.engine.n_slots):
            return web.json_response({"error": "invalid slot id"}, status=400)
        action = request.query.get("action", "")
        body = {}
        try:
            body = await request.json()
        except Exception:
            pass
        fname = body.get("filename", f"slot{idx}.bin")
        path = str(Path(self.slot_save_path) / Path(fname).name)
        loop = asyncio.get_event_loop()
        if action == "save":
            r = await loop.run_in_executor(None, self.engine.save_slot, idx, path)
        elif action == "restore":
            r = await loop.run_in_executor(None, self.engine.restore_slot, idx, path)
        elif action == "erase":
            r = self.engine.erase_slot(idx)
        else:
            return web.json_response({"error": "unknown action"}, status=400)
        return web.json_response(r)

    async def version(self, request):
        """GET /version (server.cpp:1921): API version + optional-feature
        flags. zstd transparent compression is a sqlite-extension feature of
        the reference build; the Python session DB stores plain text."""
        return web.json_response({
            "version": 4,
            "features": {"sql": self.session_db is not None,
                         "zstd_compression": False}})

    async def props_simple(self, request):
        """GET /v1/props (server.cpp:1068 handle_props_simple): trimmed
        props + the most-advanced slot's position."""
        n_past, slot_id = 0, 0
        for i, s in enumerate(self.engine.slots):
            if len(s.cache_tokens) > n_past:
                n_past, slot_id = len(s.cache_tokens), i
        return web.json_response({
            "model_name": Path(self.model_name).stem,
            "model_path": self.model_name,
            "modalities": {"vision": self.clip is not None,
                           "audio": self.audio is not None},
            "n_past": n_past,
            "slot_id": slot_id,
        })

    async def slots_list(self, request):
        """GET /slots/list (server.cpp list_slot_prompts): each slot's
        cached prompt."""
        out = []
        for i, s in enumerate(self.engine.slots):
            toks = list(s.cache_tokens)
            out.append({"slot_id": i, "token_count": len(toks),
                        "prompt": self.rt.tokenizer.decode(toks)})
        return web.json_response(out)

    async def saved_prompts_list(self, request):
        """GET /list (server.cpp list_saved_prompts): enumerate state files
        in slot_save_path with their cached prompt text."""
        from ..runtime.state import read_state_meta
        out = []
        try:
            for p in sorted(Path(self.slot_save_path).iterdir()):
                if not p.is_file():
                    continue
                meta = read_state_meta(p)
                if meta is None:
                    continue
                toks = meta.get("tokens", [])
                out.append({
                    "filename": p.name,
                    "filesize": p.stat().st_size,
                    "mtime": time.strftime("%Y-%m-%d %H:%M:%S",
                                           time.localtime(p.stat().st_mtime)),
                    "token_count": len(toks),
                    "prompt": self.rt.tokenizer.decode(toks),
                })
        except OSError as e:
            return web.json_response({"error": str(e)}, status=500)
        return web.json_response(out)

    @staticmethod
    def _safe_name(name) -> str | None:
        """Directory-traversal guard shared by the saved-prompt file
        endpoints (server.cpp delete_saved_prompt)."""
        if not isinstance(name, str) or not name or ".." in name \
                or "/" in name or "\\" in name:
            return None
        return name

    async def delete_prompt(self, request):
        """POST /delete_prompt {"filename"} (server.cpp:1807)."""
        body = await request.json()
        name = self._safe_name(body.get("filename"))
        if name is None:
            return web.json_response({"error": "Invalid filename format."},
                                     status=400)
        p = Path(self.slot_save_path) / name
        if not p.is_file():
            return web.json_response({"error": "File not found."}, status=404)
        p.unlink()
        return web.json_response({"status": "deleted", "filename": name})

    async def rename_prompt(self, request):
        """POST /rename_prompt {"old_filename","new_filename"}."""
        body = await request.json()
        old = self._safe_name(body.get("old_filename"))
        new = self._safe_name(body.get("new_filename"))
        if old is None or new is None:
            return web.json_response({"error": "Invalid filename format."},
                                     status=400)
        src = Path(self.slot_save_path) / old
        if not src.is_file():
            return web.json_response({"error": "File not found."}, status=404)
        src.rename(Path(self.slot_save_path) / new)
        return web.json_response({"status": "renamed", "filename": new})

    # ----------------------------------------------- control vectors
    def _reapply_cvec(self):
        """Rebuild the summed dense steering tensor from every loaded
        vector with scale != 0 (SERVER_TASK_TYPE_SET_CONTROL_VECTOR,
        server-context.cpp:3081+; layer range is 1-indexed inclusive like
        the reference's direction.<il> tensor names)."""
        from ..runtime.cvector import (apply_control_vector,
                                       load_control_vector,
                                       remove_control_vector)
        cfg = self.rt.cfg
        total = None
        for cv in self.control_vectors:
            cv["applied"] = cv["scale"] != 0.0
            if not cv["applied"]:
                continue
            dense = load_control_vector(
                cv["path"], cfg.n_layer, cfg.n_embd, scale=cv["scale"],
                layer_start=cv["layer_start"] - 1, layer_end=cv["layer_end"])
            total = dense if total is None else total + dense
        # the engine passes rt.params into the jitted step each call; adding
        # or removing the "cvec" leaf changes the pytree structure and
        # triggers a re-trace on the next step automatically.  Mutate a COPY
        # and rebind atomically: the engine thread may be flattening the old
        # dict for a step at this very moment (handler runs on the aiohttp
        # thread), and in-place insertion would race that iteration.
        params = dict(self.rt.params)
        if total is None:
            remove_control_vector(params)
        else:
            apply_control_vector(params, total)
        self.rt.params = params

    async def cvec_list(self, request):
        """GET /control-vectors (server.cpp:1639)."""
        return web.json_response([
            {"id": i, "path": cv["path"], "scale": cv["scale"],
             "layer_start": cv["layer_start"], "layer_end": cv["layer_end"],
             "applied": cv["applied"]}
            for i, cv in enumerate(self.control_vectors)])

    async def cvec_load(self, request):
        """POST /control-vectors/load {"path", "scale"?, "layer_start"?,
        "layer_end"?} (server-context.cpp:3081). Re-loading a path updates
        its parameters instead of duplicating."""
        body = await request.json()
        path = body.get("path")
        if not path or not Path(path).is_file():
            return web.json_response(
                {"success": False, "error": "control vector file not found"},
                status=400)
        entry = {"path": path, "scale": float(body.get("scale", 1.0)),
                 "layer_start": int(body.get("layer_start", 1)),
                 "layer_end": int(body.get("layer_end",
                                           self.rt.cfg.n_layer)),
                 "applied": False}
        try:
            for cv in self.control_vectors:
                if cv["path"] == path:
                    cv.update(entry)
                    break
            else:
                self.control_vectors.append(entry)
            self._reapply_cvec()
        except Exception as e:
            return web.json_response({"success": False, "error": str(e)},
                                     status=400)
        return web.json_response(
            {"success": True,
             "id": [cv["path"] for cv in self.control_vectors].index(path)})

    async def cvec_unload(self, request):
        """POST /control-vectors/unload {"id"} (server-context.cpp:3158)."""
        body = await request.json()
        cid = body.get("id")
        if not isinstance(cid, int) or not \
                (0 <= cid < len(self.control_vectors)):
            return web.json_response(
                {"success": False, "error": "Missing or invalid 'id' field"},
                status=400)
        self.control_vectors.pop(cid)
        self._reapply_cvec()
        return web.json_response({"success": True})

    async def cvec_apply(self, request):
        """POST /control-vectors/apply [{"id","scale","layer_start"?,
        "layer_end"?}] — resets every scale to 0 then sets the given ones
        (server.cpp:1690)."""
        body = await request.json()
        entries = body if isinstance(body, list) else [body]
        # validate BEFORE mutating any state: a bad id must leave both the
        # bookkeeping and the applied steering tensor untouched
        for entry in entries:
            cid = entry.get("id")
            if not isinstance(cid, int) or not \
                    (0 <= cid < len(self.control_vectors)):
                return web.json_response(
                    {"success": False, "error": "Invalid control vector id"},
                    status=400)
        for cv in self.control_vectors:
            cv["scale"] = 0.0
        for entry in entries:
            cv = self.control_vectors[entry["id"]]
            cv["scale"] = float(entry.get("scale", 0.0))
            if "layer_start" in entry:
                cv["layer_start"] = int(entry["layer_start"])
            if "layer_end" in entry:
                cv["layer_end"] = int(entry["layer_end"])
        self._reapply_cvec()
        return web.json_response({"success": True})

    # ------------------------------------------------- device profiler
    async def profiler_start(self, request):
        """POST /profiler/start {"dir"?}: begin a jax.profiler (XPlane)
        capture of the live serving workload — the TPU analogue of the
        reference's IK_PRINT_TIMING stage timers / nvtx ranges. View the
        trace with tensorboard or xprof."""
        import jax
        body = await request.json() if request.can_read_body else {}
        if self._profile_dir is not None:
            return web.json_response(
                {"success": False, "error": "profiler already running",
                 "dir": self._profile_dir}, status=400)
        logdir = (body or {}).get("dir") or "/tmp/ik_tpu_trace"
        try:
            jax.profiler.start_trace(logdir)
        except Exception as e:
            return web.json_response({"success": False, "error": str(e)},
                                     status=400)
        self._profile_dir = logdir
        return web.json_response({"success": True, "dir": logdir})

    async def profiler_stop(self, request):
        import jax
        if self._profile_dir is None:
            return web.json_response(
                {"success": False, "error": "profiler not running"},
                status=400)
        logdir, self._profile_dir = self._profile_dir, None
        try:
            jax.profiler.stop_trace()
        except Exception as e:
            return web.json_response({"success": False, "error": str(e)},
                                     status=400)
        return web.json_response({"success": True, "dir": logdir})

    # -------------------------------------------- session DB endpoints
    def _db_or_503(self):
        if self.session_db is None:
            return web.json_response(
                {"ok": False,
                 "message": "session store disabled; start the server with "
                            "--sql-save-file"}, status=500)
        return None

    async def db_load(self, request):
        """POST /load {"storeName","key"} (server.cpp:1987)."""
        if (err := self._db_or_503()) is not None:
            return err
        body = await request.json()
        data = self.session_db.load(body.get("storeName"), body.get("key"))
        if data is None:
            return web.json_response({"ok": False, "message": "Key not found"},
                                     status=404)
        return web.json_response({"ok": True, "result": data})

    async def db_save(self, request):
        """POST /save {"storeName","key","data"}."""
        if (err := self._db_or_503()) is not None:
            return err
        body = await request.json()
        self.session_db.save(body.get("storeName"), body.get("key"),
                             body.get("data"))
        return web.json_response({"ok": True,
                                  "result": "Data saved successfully"})

    async def db_rename(self, request):
        """POST /rename {"key","newName"}."""
        if (err := self._db_or_503()) is not None:
            return err
        body = await request.json()
        self.session_db.rename(body.get("key"), str(body.get("newName", "")))
        return web.json_response({"ok": True,
                                  "result": "Session renamed successfully"})

    async def db_all(self, request):
        """POST /all {"storeName"} — every document in a store."""
        if (err := self._db_or_503()) is not None:
            return err
        body = await request.json()
        return web.json_response(
            {"ok": True, "result": self.session_db.all(body.get("storeName"))})

    async def db_sessions(self, request):
        """GET|POST /sessions — {key: display name} listing."""
        if (err := self._db_or_503()) is not None:
            return err
        return web.json_response({"ok": True,
                                  "result": self.session_db.sessions()})

    async def db_delete(self, request):
        """POST /delete {"storeName","key"}."""
        if (err := self._db_or_503()) is not None:
            return err
        body = await request.json()
        self.session_db.delete(body.get("storeName"), body.get("key"))
        return web.json_response({"ok": True,
                                  "result": "Session deleted successfully"})

    async def db_vacuum(self, request):
        if (err := self._db_or_503()) is not None:
            return err
        self.session_db.vacuum()
        return web.json_response({"ok": True})

    async def lora_list(self, request):
        """GET /lora-adapters (server.cpp /lora-adapters)."""
        return web.json_response([
            {"id": i, "path": a.path, "scale": a.scale}
            for i, a in enumerate(self.loras)])

    async def lora_set(self, request):
        """POST /lora-adapters: [{"id": N, "scale": S}, ...]."""
        from ..runtime.lora import set_lora_scale
        body = await request.json()
        for item in body if isinstance(body, list) else [body]:
            i = int(item.get("id", 0))
            if 0 <= i < len(self.loras):
                set_lora_scale(self.rt.params, float(item.get("scale", 1.0)),
                               self.loras[i])
        return await self.lora_list(request)

    async def apply_template(self, request):
        """/apply-template: render chat messages through the model's chat
        template without generating (server.cpp /apply-template)."""
        body = await request.json()
        prompt = self._chat_prompt(body.get("messages", []))
        return web.json_response({"prompt": prompt})

    async def completion(self, request):
        """llama.cpp-native /completion."""
        body = await request.json()
        prompt = body.get("prompt", "")
        ids = prompt if isinstance(prompt, list) else self.rt.tokenizer.encode(prompt)
        if body.get("stream"):
            resp = web.StreamResponse(headers={"Content-Type": "text/event-stream", "Access-Control-Allow-Origin": "*"})
            await resp.prepare(request)

            t_last = [time.time()]

            async def on_token(piece, done):
                payload = {"content": piece, "stop": done}
                if body.get("timings_per_token"):
                    now = time.time()
                    dt = max(now - t_last[0], 1e-9)
                    t_last[0] = now
                    payload["timings"] = {
                        "predicted_per_token_ms": round(dt * 1e3, 3),
                        "predicted_per_second": round(1.0 / dt, 2)}
                await resp.write(
                    b"data: " + json.dumps(payload).encode() + b"\n\n")

            toks, text = await self._run(ids, body, True, on_token)
            await resp.write(b"data: " + json.dumps(
                {"content": "", "stop": True,
                 "tokens_predicted": len(toks)}).encode() + b"\n\n")
            await resp.write_eof()
            return resp
        ro: dict = {}
        toks, text = await self._run(ids, body, False, req_out=ro)
        out = {
            "content": text, "tokens_predicted": len(toks),
            "tokens_evaluated": len(ids), "stop": True, "model": self.model_name,
        }
        probs = ro.get("req").probs_out if ro.get("req") else []
        if probs:
            dec = lambda t: self.rt.tokenizer.decode([int(t)])
            out["completion_probabilities"] = [
                {"content": dec(p["id"]),
                 "probs": [{"tok_str": dec(i), "prob": float(np.exp(lp))}
                           for i, lp in p["top"]]}
                for p in probs]
        return web.json_response(out)

    async def oai_completions(self, request):
        body = await request.json()
        prompt = body.get("prompt", "")
        ids = prompt if isinstance(prompt, list) else self.rt.tokenizer.encode(prompt)
        rid = f"cmpl-{uuid.uuid4().hex[:12]}"
        if body.get("stream"):
            resp = web.StreamResponse(headers={"Content-Type": "text/event-stream", "Access-Control-Allow-Origin": "*"})
            await resp.prepare(request)

            async def on_token(piece, done):
                chunk = {"id": rid, "object": "text_completion",
                         "created": int(time.time()), "model": self.model_name,
                         "choices": [{"index": 0, "text": piece,
                                      "finish_reason": "stop" if done else None}]}
                await resp.write(b"data: " + json.dumps(chunk).encode() + b"\n\n")

            toks, _ = await self._run(ids, body, True, on_token)
            if isinstance(body.get("stream_options"), dict) and \
                    body["stream_options"].get("include_usage"):
                usage_chunk = {"id": rid, "object": "text_completion",
                               "created": int(time.time()),
                               "model": self.model_name, "choices": [],
                               "usage": {"prompt_tokens": len(ids),
                                         "completion_tokens": len(toks),
                                         "total_tokens":
                                             len(ids) + len(toks)}}
                await resp.write(b"data: " + json.dumps(usage_chunk).encode()
                                 + b"\n\n")
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        ro: dict = {}
        toks, text = await self._run(ids, body, False, req_out=ro)
        choice = {"index": 0, "text": text, "finish_reason": "stop"}
        probs = ro.get("req").probs_out if ro.get("req") else []
        if probs:
            dec = lambda t: self.rt.tokenizer.decode([int(t)])
            choice["logprobs"] = {
                "tokens": [dec(p["id"]) for p in probs],
                "token_logprobs": [p["logprob"] for p in probs],
                "top_logprobs": [{dec(i): lp for i, lp in p["top"]}
                                 for p in probs],
                "text_offset": [],
            }
        return web.json_response({
            "id": rid, "object": "text_completion", "created": int(time.time()),
            "model": self.model_name,
            "choices": [choice],
            "usage": {"prompt_tokens": len(ids), "completion_tokens": len(toks),
                      "total_tokens": len(ids) + len(toks)},
        })

    def _extract_images(self, messages: list[dict]):
        """Replace image_url / input_audio content parts with <__image__> /
        <__audio__> markers; returns (messages, decoded media in marker
        order). Accepts base64 data URLs for images and base64 WAV (16 kHz
        mono PCM16, OpenAI input_audio format) for audio
        (/v1/chat/completions, examples/mtmd)."""
        import base64
        import io
        media = []
        out_msgs = []
        for m in messages:
            c = m.get("content")
            if not isinstance(c, list):
                out_msgs.append(m)
                continue
            text_parts = []
            for part in c:
                if not isinstance(part, dict):
                    continue
                if part.get("type") == "image_url":
                    url = part.get("image_url", {})
                    url = url.get("url", url) if isinstance(url, dict) else url
                    if isinstance(url, str) and url.startswith("data:"):
                        b64 = url.split(",", 1)[1]
                        from PIL import Image
                        media.append(Image.open(io.BytesIO(
                            base64.b64decode(b64))))
                        text_parts.append("<__image__>")
                elif part.get("type") == "input_audio":
                    spec = part.get("input_audio", {})
                    data = base64.b64decode(spec.get("data", ""))
                    media.append(decode_wav(data))
                    text_parts.append("<__audio__>")
                else:
                    text_parts.append(part.get("text", ""))
            out_msgs.append({**m, "content": "".join(text_parts)})
        return out_msgs, media

    async def oai_chat(self, request):
        body = await request.json()
        messages = body.get("messages", [])
        images = []
        if self.clip is not None or self.audio is not None:
            messages, images = self._extract_images(messages)
        if images:
            return await self._chat_multimodal(body, messages, images)
        body = self._apply_tool_choice(body)
        prompt = self._chat_prompt(messages, tools=body.get("tools"))
        ids = self.rt.tokenizer.encode(prompt)
        rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
        if body.get("stream"):
            resp = web.StreamResponse(headers={"Content-Type": "text/event-stream", "Access-Control-Allow-Origin": "*"})
            await resp.prepare(request)

            async def emit(delta, finish=None):
                chunk = {"id": rid, "object": "chat.completion.chunk",
                         "created": int(time.time()), "model": self.model_name,
                         "choices": [{"index": 0, "delta": delta,
                                      "finish_reason": finish}]}
                await resp.write(b"data: " + json.dumps(chunk).encode()
                                 + b"\n\n")

            # streamed reasoning/tool-call split (the reference's streaming
            # chat parsers, common/chat.cpp): re-parse the accumulated text
            # each token and emit reasoning_content / content DELTAS; a
            # small holdback keeps half-open markers ("<thi", a partial
            # tool-call opener) from leaking into content mid-stream
            HOLDBACK = 24
            st = {"acc": "", "r": "", "c": ""}

            async def on_token(piece, done):
                st["acc"] += piece
                reasoning, content, _ = self._parse_chat_output(st["acc"])
                delta = {}
                if (len(reasoning) > len(st["r"])
                        and reasoning.startswith(st["r"])):
                    delta["reasoning_content"] = reasoning[len(st["r"]):]
                    st["r"] = reasoning
                lim = len(content) if done else max(0,
                                                    len(content) - HOLDBACK)
                if lim > len(st["c"]) and content.startswith(st["c"]):
                    delta["content"] = content[len(st["c"]):lim]
                    st["c"] = content[:lim]
                if delta:
                    await emit(delta)

            await self._run(ids, body, True, on_token)
            _, _, calls = self._parse_chat_output(st["acc"])
            if calls:
                await emit({"tool_calls": [
                    {"index": i, "id": c.id, "type": "function",
                     "function": {"name": c.name, "arguments": c.arguments}}
                    for i, c in enumerate(calls)]}, "tool_calls")
            else:
                await emit({}, "stop")
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp
        ro: dict = {}
        toks, text = await self._run(ids, body, False, req_out=ro)
        reasoning, content, calls = self._parse_chat_output(text)
        message = {"role": "assistant", "content": content or None}
        if reasoning:
            message["reasoning_content"] = reasoning
        finish = "stop"
        if calls:
            message["tool_calls"] = [c.to_openai() for c in calls]
            finish = "tool_calls"
        choice = {"index": 0, "message": message, "finish_reason": finish}
        probs = ro.get("req").probs_out if ro.get("req") else []
        if probs:
            dec = lambda t: self.rt.tokenizer.decode([int(t)])
            choice["logprobs"] = {"content": [
                {"token": dec(p["id"]), "logprob": p["logprob"],
                 "top_logprobs": [{"token": dec(i), "logprob": lp}
                                  for i, lp in p["top"]]}
                for p in probs]}
        return web.json_response({
            "id": rid, "object": "chat.completion", "created": int(time.time()),
            "model": self.model_name,
            "choices": [choice],
            "usage": {"prompt_tokens": len(ids), "completion_tokens": len(toks),
                      "total_tokens": len(ids) + len(toks)},
        })

    def _apply_tool_choice(self, body: dict) -> dict:
        """tool_choice 'required' / named function: force a schema-valid
        tool call via a grammar over the template's call format (the
        reference's lazy tool-call grammars, common/chat.cpp)."""
        tc = body.get("tool_choice")
        if not body.get("tools") or _grammar_from(body) is not None:
            return body
        if tc == "none":
            # tools must not be called NOR advertised in the template
            return {**body, "tools": None}
        sel = None
        if tc == "required":
            sel = body["tools"]
        elif isinstance(tc, dict) and tc.get("type") == "function":
            want = (tc.get("function") or {}).get("name")
            sel = [t for t in body["tools"]
                   if (t.get("function") or {}).get("name") == want]
        if not sel:
            return body
        from ..runtime.json_schema import tool_call_gbnf
        ca = self.chat_analysis
        open_tag = ca.call_lead if ca is not None and ca.has_tools() else ""
        close_tag = ca.call_trail if ca is not None and ca.has_tools() else ""
        try:
            g = tool_call_gbnf(sel, open_tag=open_tag, close_tag=close_tag)
        except Exception:
            return body          # unconvertible schema: fall back to free-form
        return {**body, "grammar": g}

    def _parse_chat_output(self, text: str):
        """Shared reasoning/tool-call extraction (auto-parser first, named
        parsers as fallback) — the tail of the oai_chat non-stream path."""
        if self.chat_analysis is not None and (
                self.chat_analysis.has_tools()
                or self.chat_analysis.reasoning_open):
            from ..runtime.chat_autoparser import parse_auto
            reasoning, content, calls = parse_auto(text, self.chat_analysis)
            if not calls and not reasoning:
                reasoning, content = split_reasoning(text)
                content, calls = parse_tool_calls(content)
        else:
            reasoning, content = split_reasoning(text)
            content, calls = parse_tool_calls(content)
        return reasoning, content, calls

    async def oai_responses(self, request):
        """POST /v1/responses — OpenAI Responses API (server.cpp:2138;
        request conversion server-chat.cpp:6, output builders
        server-task.cpp:236/473/544). Converted to a chat-completions body,
        run through the same engine path, rebuilt in Responses shape."""
        from .responses import (ResponsesStream, build_response, new_ids,
                                responses_to_chatcmpl, sse)
        body = await request.json()
        try:
            chat_body = responses_to_chatcmpl(body)
        except ValueError as e:
            return web.json_response(
                {"error": {"message": str(e),
                           "type": "invalid_request_error"}}, status=400)
        messages = chat_body.get("messages", [])
        if self.clip is not None or self.audio is not None:
            messages, images = self._extract_images(messages)
            if images:
                return web.json_response(
                    {"error": {"message":
                               "input_image is not supported on /v1/responses"
                               " yet; use /v1/chat/completions",
                               "type": "invalid_request_error"}}, status=400)
        prompt = self._chat_prompt(messages, tools=chat_body.get("tools"))
        ids_tok = self.rt.tokenizer.encode(prompt)
        ids = new_ids()
        if chat_body.get("stream"):
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"})
            await resp.prepare(request)
            stream = ResponsesStream(ids, self.model_name)
            for ev in stream.open_events():
                await resp.write(sse(ev))

            async def on_token(piece, done):
                for ev in stream.delta_events(piece):
                    await resp.write(sse(ev))

            toks, text = await self._run(ids_tok, chat_body, True, on_token)
            reasoning, content, calls = self._parse_chat_output(text)
            for ev in stream.final_events(
                    reasoning=reasoning, content=content,
                    tool_calls=[{"id": c.id, "name": c.name,
                                 "arguments": c.arguments} for c in calls],
                    n_prompt=len(ids_tok), n_decoded=len(toks)):
                await resp.write(sse(ev))
            await resp.write_eof()   # no [DONE] sentinel (server.cpp:1250)
            return resp
        toks, text = await self._run(ids_tok, chat_body, False)
        reasoning, content, calls = self._parse_chat_output(text)
        return web.json_response(build_response(
            ids, self.model_name, reasoning=reasoning, content=content,
            tool_calls=[{"id": c.id, "name": c.name,
                         "arguments": c.arguments} for c in calls],
            n_prompt=len(ids_tok), n_decoded=len(toks)))

    async def _chat_multimodal(self, body, messages, images):
        """Image-bearing chat: runs the mtmd path (vision encode + embedding
        splice) outside the batch engine, serialized by a lock."""
        from ..runtime.mtmd import generate_mm
        from ..runtime.sampling import SamplerParams
        prompt = self._chat_prompt(messages)
        sampler = _sampler_from(body)
        n_predict = int(body.get("n_predict", body.get("max_tokens", 128)))
        loop = asyncio.get_event_loop()
        async with self._mm_lock:
            n_prompt, out = await loop.run_in_executor(
                None, lambda: generate_mm(
                    self.rt, prompt, images, self.clip,
                    audio_encoder=self.audio,
                    max_new_tokens=n_predict, sampler=sampler,
                    seed=int(body.get("seed", 0)),
                    capacity=self.engine.capacity))
        text = self.rt.tokenizer.decode(
            [t for t in out if t != self.rt.tokenizer.eos_id])
        reasoning, content = split_reasoning(text)
        message = {"role": "assistant", "content": content}
        if reasoning:
            message["reasoning_content"] = reasoning
        return web.json_response({
            "id": f"chatcmpl-{uuid.uuid4().hex[:12]}",
            "object": "chat.completion", "created": int(time.time()),
            "model": self.model_name,
            "choices": [{"index": 0, "message": message,
                         "finish_reason": "stop"}],
            "usage": {"prompt_tokens": n_prompt, "completion_tokens": len(out),
                      "total_tokens": n_prompt + len(out)},
        })

    @staticmethod
    def _anthropic_flatten(messages: list[dict]) -> list[dict]:
        """Flatten Anthropic content blocks (text / tool_use / tool_result)
        into plain-text chat messages for templating."""
        out = []
        for m in messages:
            c = m.get("content")
            if isinstance(c, str):
                out.append(m)
                continue
            parts = []
            for blk in c or []:
                t = blk.get("type")
                if t == "text":
                    parts.append(blk.get("text", ""))
                elif t == "tool_use":
                    parts.append(f"<tool_call>{json.dumps({'name': blk.get('name'), 'arguments': blk.get('input', {})})}</tool_call>")
                elif t == "tool_result":
                    content = blk.get("content")
                    if isinstance(content, list):
                        content = "".join(p.get("text", "") for p in content
                                          if isinstance(p, dict))
                    parts.append(f"<tool_response>{content}</tool_response>")
            out.append({**m, "content": "\n".join(parts)})
        return out

    async def anthropic_messages(self, request):
        body = await request.json()
        messages = self._anthropic_flatten(body.get("messages", []))
        if body.get("system"):
            sys_c = body["system"]
            if isinstance(sys_c, list):
                sys_c = "".join(p.get("text", "") for p in sys_c
                                if isinstance(p, dict))
            messages = [{"role": "system", "content": sys_c}] + messages
        tools = None
        if body.get("tools"):
            # Anthropic tool schema -> the OpenAI-style shape chat templates
            # expect (input_schema -> parameters)
            tools = [{"type": "function",
                      "function": {"name": t.get("name"),
                                   "description": t.get("description", ""),
                                   "parameters": t.get("input_schema", {})}}
                     for t in body["tools"]]
            # Anthropic tool_choice: "any" forces some call, "tool" a
            # specific one — mapped onto the grammar-forced OpenAI flow
            atc = body.get("tool_choice")
            if isinstance(atc, dict) and atc.get("type") in ("any", "tool"):
                oai_tc = ("required" if atc["type"] == "any" else
                          {"type": "function",
                           "function": {"name": atc.get("name")}})
                body = self._apply_tool_choice(
                    {**body, "tools": tools, "tool_choice": oai_tc})
        prompt = self._chat_prompt(messages, tools=tools)
        ids = self.rt.tokenizer.encode(prompt)
        body.setdefault("max_tokens", 128)
        rid = f"msg_{uuid.uuid4().hex[:16]}"
        if body.get("stream"):
            resp = web.StreamResponse(headers={"Content-Type": "text/event-stream", "Access-Control-Allow-Origin": "*"})
            await resp.prepare(request)

            async def ev(name, data):
                await resp.write(f"event: {name}\ndata: {json.dumps(data)}\n\n"
                                 .encode())

            await ev("message_start", {"type": "message_start", "message": {
                "id": rid, "type": "message", "role": "assistant",
                "content": [], "model": self.model_name,
                "usage": {"input_tokens": len(ids), "output_tokens": 0}}})
            await ev("content_block_start", {
                "type": "content_block_start", "index": 0,
                "content_block": {"type": "text", "text": ""}})

            async def on_token(piece, done):
                await ev("content_block_delta", {
                    "type": "content_block_delta", "index": 0,
                    "delta": {"type": "text_delta", "text": piece}})

            toks, text = await self._run(ids, body, True, on_token)
            await ev("content_block_stop", {"type": "content_block_stop",
                                            "index": 0})
            await ev("message_delta", {"type": "message_delta",
                                       "delta": {"stop_reason": "end_turn"},
                                       "usage": {"output_tokens": len(toks)}})
            await ev("message_stop", {"type": "message_stop"})
            await resp.write_eof()
            return resp
        toks, text = await self._run(ids, body, False)
        reasoning, content_text = split_reasoning(text)
        content_text, calls = parse_tool_calls(content_text)
        content = []
        if reasoning:
            content.append({"type": "thinking", "thinking": reasoning})
        if content_text:
            content.append({"type": "text", "text": content_text})
        for c in calls:
            content.append({"type": "tool_use",
                            "id": "toolu_" + uuid.uuid4().hex[:16],
                            "name": c.name,
                            "input": json.loads(c.arguments or "{}")})
        if not content:
            content = [{"type": "text", "text": ""}]
        return web.json_response({
            "id": rid,
            "type": "message", "role": "assistant",
            "content": content,
            "model": self.model_name,
            "stop_reason": "tool_use" if calls else "end_turn",
            "usage": {"input_tokens": len(ids), "output_tokens": len(toks)},
        })

    async def anthropic_count_tokens(self, request):
        """POST /v1/messages/count_tokens (server.cpp Anthropic API)."""
        body = await request.json()
        messages = body.get("messages", [])
        if body.get("system"):
            messages = [{"role": "system", "content": body["system"]}] + messages
        prompt = self._chat_prompt(messages)
        return web.json_response(
            {"input_tokens": len(self.rt.tokenizer.encode(prompt))})


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--parallel", type=int, default=4)
    ap.add_argument("--spec",   # ngram | suffix | dflash:<draft.gguf>
                    help="self-speculation stage for the decode loop "
                         "(drafts verified in the shared batched step)")
    ap.add_argument("--spec-n", type=int, default=8,
                    help="draft tokens per speculative step")
    ap.add_argument("--ctx-size", type=int, default=2048)
    ap.add_argument("--swa-compress", action="store_true",
                    help="ring caches on sliding-window layers")
    ap.add_argument("--i8-mxu", action="store_true",
                    help="int8 x int8 MXU matmuls (Q8_K-activation "
                         "analogue)")
    ap.add_argument("--cache-ram", "-cram", type=int, default=0,
                    help="RAM prompt-cache tier in MiB for evicted slot "
                         "states (0 = off, -1 = unlimited); the reference's "
                         "--cache-ram similarity-matched restore")
    ap.add_argument("--cache-type",
                    choices=["bf16", "q8", "q6", "q4", "iq4_nl"],
                    default="bf16",
                    help="KV cache type (-ctk/-ctv analogue)")
    ap.add_argument("-khad", "--k-hadamard", action="store_true",
                    help="Hadamard-rotate K (+q) before KV quantization "
                         "(outlier taming; reference -khad)")
    ap.add_argument("-vhad", "--v-hadamard", action="store_true",
                    help="Hadamard-rotate V before KV quantization "
                         "(reference -vhad)")
    ap.add_argument("--lora", action="append", default=[],
                    help="LoRA adapter GGUF (repeatable); PATH or PATH:SCALE")
    ap.add_argument("--mmproj", help="CLIP mmproj GGUF for image input")
    ap.add_argument("--sql-save-file",
                    help="sqlite file for the WebUI session store "
                         "(/load /save /sessions …)")
    ap.add_argument("--slot-save-path", default="/tmp",
                    help="directory for slot save/restore state files")
    ap.add_argument("--control-vector", action="append", default=[],
                    help="control-vector GGUF (repeatable); PATH or "
                         "PATH:SCALE, applied at startup")
    ap.add_argument("--api-key", help="require this key (Bearer or x-api-key)")
    ap.add_argument("--ssl-key-file",
                    help="PEM-encoded SSL private key: serve HTTPS "
                         "(with --ssl-cert-file; reference --ssl-key-file)")
    ap.add_argument("--ssl-cert-file",
                    help="PEM-encoded SSL certificate")

    class _AllowAction(argparse.Action):
        # --allowlist-unicode-rule appends to the CURRENT ruleset and
        # --allowlist-keyword closes it (starting the next), so flag ORDER
        # is meaningful — record the interleaving (common.cpp:2327-2345)
        def __call__(self, parser, ns, values, option_string=None):
            seq = list(getattr(ns, "allow_seq", None) or [])
            seq.append(("kw" if "keyword" in option_string else "rule",
                        values))
            ns.allow_seq = seq
    ap.add_argument("--allowlist-unicode-rule", action=_AllowAction,
                    metavar="LOWER..UPPER,SCRIPT:BIAS", dest="allow_seq",
                    help="allowlist unicode script/codepoint rule; tokens "
                         "with codepoints outside every rule are banned "
                         "(repeatable; rules between two --allowlist-keyword "
                         "flags form one ruleset)")
    ap.add_argument("--allowlist-keyword", action=_AllowAction,
                    dest="allow_seq",
                    help="generated-text keyword that expires the current "
                         "ruleset and activates the next")
    ap.add_argument("--allowlist-pieces", action="append", default=[],
                    help="always-allowed text piece (tokenized; repeatable); "
                         "its tokens get each ruleset's max bias")
    ap.add_argument("--allowlist-keyword-delay", type=int, default=0,
                    help="min decoded tokens before keyword matching starts")
    ap.add_argument("--expiring-logit-bias-file",
                    help="expiring-logit-bias rule file (phrase biases "
                         "with durations + exit/jump-word state machine; "
                         "reference PR #1731); per-request override via "
                         "the expiring_logit_bias field")
    ap.add_argument("--distributed", metavar="COORD[,NPROC,PID]",
                    help="jax.distributed multi-host init: coordinator "
                    "address (host:port)[, process count, process id]. "
                    "The mesh then spans all hosts' chips (ICI+DCN); host 0 "
                    "serves HTTP. Experimental — replaces the reference's "
                    "RPC backend (SURVEY §2.4).")
    ap.add_argument("-tp", "--tensor-parallel", type=int, default=0,
                    help="shard the model over N chips (-sm graph analogue)")
    ap.add_argument("-ep", "--expert-parallel", type=int, default=1,
                    help="whole-expert sharding factor (MoE)")
    ap.add_argument("-sml", "--layer-split", type=int, default=0,
                    help="split contiguous layer ranges over N chips "
                    "(-sm layer analogue: capacity over collectives; "
                    "exclusive with -tp)")
    args = ap.parse_args(argv)

    if args.distributed:
        import jax
        parts = args.distributed.split(",")
        kw = {"coordinator_address": parts[0]}
        if len(parts) > 1:
            kw["num_processes"] = int(parts[1])
        if len(parts) > 2:
            kw["process_id"] = int(parts[2])
        jax.distributed.initialize(**kw)
        if not args.tensor_parallel:
            # default: TP over every chip of every host
            args.tensor_parallel = jax.device_count() // max(
                1, args.expert_parallel)

    if args.i8_mxu:
        from ..models.weights import set_i8_mxu
        set_i8_mxu(True)
    # per-projection LoRA requires unfused q/k/v linears
    rt = Runtime.from_gguf(
        args.gguf,
        kv_quant=False if args.cache_type == "bf16" else args.cache_type,
                           fuse=not args.lora,
                           swa_compress=args.swa_compress,
                           tensor_parallel=args.tensor_parallel,
                           expert_parallel=args.expert_parallel,
                           layer_split=args.layer_split,
                           k_hadamard=args.k_hadamard,
                           v_hadamard=args.v_hadamard)
    loras = []
    for spec in args.lora:
        from ..runtime.lora import apply_lora, load_lora_gguf
        path, _, s = spec.rpartition(":")
        if path and s.replace(".", "").isdigit():
            adapter = load_lora_gguf(path)
            adapter.scale = float(s)
        else:
            adapter = load_lora_gguf(spec)
        apply_lora(rt.params, adapter)
        loras.append(adapter)
    if args.distributed:
        # every process builds the identical engine over the global mesh;
        # host 0 drives it (slot loop + HTTP), followers replay each
        # broadcast step descriptor in lockstep (server/multihost.py)
        import jax
        from .multihost import DistributedEngine, StepChannel, worker_loop
        chan = StepChannel(args.parallel, spec_n=args.spec_n)
        engine = DistributedEngine(rt, chan, n_slots=args.parallel,
                                   capacity=args.ctx_size,
                                   spec=args.spec, spec_n=args.spec_n)
        if jax.process_index() != 0:
            worker_loop(engine)
            return
    else:
        engine = BatchEngine(rt, n_slots=args.parallel,
                             capacity=args.ctx_size,
                             spec=args.spec, spec_n=args.spec_n,
                             cache_ram_mib=args.cache_ram)
    engine.start()
    srv = Server(engine, model_name=str(args.gguf), api_key=args.api_key)
    if getattr(args, "allow_seq", None):
        from ..runtime.allowlist import parse_rule
        rulesets: list[list] = []
        kws: list[str] = []
        for kind, val in args.allow_seq:
            if kind == "rule":
                if not rulesets:
                    rulesets.append([])
                rulesets[-1].append(parse_rule(val))
            else:
                kws.append(val)
                rulesets.append([])
        srv.allow_rules = rulesets
        srv.allow_kws = kws
    srv.allow_pieces = list(args.allowlist_pieces)
    srv.allow_kw_delay = args.allowlist_keyword_delay
    if args.expiring_logit_bias_file:
        srv.expiring_logit_bias = Path(
            args.expiring_logit_bias_file).read_text()
    srv.loras = loras
    srv.slot_save_path = args.slot_save_path
    if args.sql_save_file:
        from .sessions import SessionDB
        srv.session_db = SessionDB(args.sql_save_file)
    for spec in args.control_vector:
        path, _, s = spec.rpartition(":")
        scale = 1.0
        if path and s.replace(".", "").replace("-", "").isdigit():
            scale = float(s)
        else:
            path = spec
        srv.control_vectors.append(
            {"path": path, "scale": scale, "layer_start": 1,
             "layer_end": rt.cfg.n_layer, "applied": False})
    if srv.control_vectors:
        srv._reapply_cvec()
    if args.mmproj:
        from ..gguf.reader import load_gguf
        from ..models.clip import AudioEncoder, ClipEncoder
        mm_md = load_gguf(args.mmproj).metadata
        if mm_md.get("clip.has_vision_encoder"):
            srv.clip = ClipEncoder(args.mmproj)
        if mm_md.get("clip.has_audio_encoder"):
            srv.audio = AudioEncoder(args.mmproj)
    ssl_ctx = None
    if args.ssl_key_file and args.ssl_cert_file:
        # HTTPS serving (the reference's httplib SSLServer path,
        # examples/server/server.cpp:501-506)
        import ssl
        ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ssl_ctx.load_cert_chain(args.ssl_cert_file, args.ssl_key_file)
    try:
        web.run_app(srv.app, host=args.host, port=args.port,
                    ssl_context=ssl_ctx)
    finally:
        # graceful distributed shutdown: broadcast OP_SHUTDOWN so follower
        # processes exit their worker loops cleanly
        engine.stop()


if __name__ == "__main__":
    main()
