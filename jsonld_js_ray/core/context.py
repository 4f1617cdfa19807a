"""Active-context processing, term definitions, and IRI expansion.

Implements the JSON-LD 1.1 Context Processing and IRI Expansion algorithms
(W3C JSON-LD 1.1 Processing Algorithms and API §4.1–§4.3), written from the
public spec. Behavioral parity target: /root/reference/lib/context.js
(term definitions :300-1030, _expandIri :1033-1197, initial context
:1207-1231). Not a translation — a fresh implementation structured for
per-worker caching inside Ray actors (see stages/expand_quads.py).
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

from .errors import JsonLdError
from .keywords import (
    BCP47_RE, KEYWORDS, is_absolute_iri, is_keyword, is_keyword_like,
)
from .url import DeletedBase, prepend_base

# event codes that `safe` mode turns into errors (cf. reference
# lib/events.js:103-142)
SAFE_EVENT_CODES = frozenset({
    "empty object", "free-floating scalar", "invalid @language value",
    "invalid property", "null @id value", "null @value value",
    "object with only @id", "object with only @language", "object with only @list",
    "object with only @value", "relative @id reference", "relative @type reference",
    "relative @vocab reference", "reserved @id value", "reserved @reverse value",
    "reserved term",
    "blank node predicate", "relative graph reference", "relative object reference",
    "relative predicate reference", "relative subject reference",
    "rdfDirection not set",
})

# a term "has IRI form" when it contains a colon followed by a
# non-colon, or a slash (reference context.js:693 /(?::[^:])|\//)
_IRI_FORM_TERM_RE = re.compile(r"(?::[^:])|/")

# module-level default handler, like the reference's
# events.defaultEventHandler (lib/events.js:21, :170-180)
_default_event_handler: list | None = None


def set_default_event_handler(handler=None):
    """Install a default event handler used when a call provides none
    (cf. reference events.setDefaultEventHandler, lib/events.js:170-180).
    Pass a falsy value to unset."""
    global _default_event_handler
    if not handler:
        _default_event_handler = None
    elif isinstance(handler, (list, tuple)):
        _default_event_handler = list(handler)
    else:
        _default_event_handler = [handler]


def safe_event_handler(event: dict, next_handler):
    """Reject unsafe warning conditions (cf. reference safeEventHandler,
    lib/events.js:131-142)."""
    if event["level"] == "warning" and event["code"] in SAFE_EVENT_CODES:
        # the observable code of a safe-mode failure is the EVENT code
        # (reference throws 'jsonld.ValidationError' with details.event;
        # events.js:132-142)
        raise JsonLdError(f"Safe mode validation error: {event['message']}",
                          event["code"], {"event": event})
    next_handler()


def unhandled_event_handler(event: dict, next_handler):
    """Throw for any event that reached the end of the chain
    (cf. reference unhandledEventHandler, lib/events.js:158-165)."""
    raise JsonLdError(f"No handler for event: {event['message']}",
                      "invalid event handler", {"event": event})


def _run_handlers(event: dict, handlers) -> bool:
    """Run a handler chain (cf. reference events._handle,
    lib/events.js:73-101). Each handler is a callable ``fn(event, next)``,
    a code-map ``{code: fn}`` (missing code implies next()), or a nested
    list of handlers. Returns True if the chain fell through."""
    do_next = True
    for handler in handlers:
        if not do_next:
            break
        do_next = False
        if isinstance(handler, (list, tuple)):
            do_next = _run_handlers(event, handler)
        elif isinstance(handler, dict):
            fn = handler.get(event["code"])
            if fn is None:
                do_next = True
            else:
                called: list = []
                fn(event, lambda: called.append(True))
                do_next = bool(called)
        elif callable(handler):
            called = []
            handler(event, lambda: called.append(True))
            do_next = bool(called)
        else:
            raise JsonLdError("Invalid event handler.",
                              "invalid event handler", {"event": event})
    return do_next


def emit_event(options: dict, code: str, message: str, level: str = "warning"):
    """Record a processing event, running the handler chain first.

    The chain is built in priority order (cf. reference
    events.setupEventHandler, lib/events.js:33-42): the safe-mode handler
    when ``safe`` is set, then ``options['eventHandler']`` (a callable,
    code-map dict, or list of either), then the module default handler.
    Events always also accumulate in ``options['_events']`` so pipeline
    stages can emit them as a side-output column (SURVEY.md §2.9)."""
    event = {"code": code, "level": level, "message": message}
    eh = options.get("eventHandler")
    if options.get("safe") or eh is not None \
            or _default_event_handler is not None:
        handlers: list = []
        if options.get("safe"):
            handlers.append(safe_event_handler)
        if eh is not None:
            handlers.extend(eh if isinstance(eh, (list, tuple)) else [eh])
        if _default_event_handler is not None:
            handlers.extend(_default_event_handler)
        _run_handlers(event, handlers)
    options.setdefault("_events", []).append(event)


def _replay_events(options: dict, events: list) -> None:
    """Re-emit events captured while a (now-cached) context was first
    processed — cached context event replay (reference
    ContextResolver/events; misc.js 'cached context event replay'):
    a later caller must see the same warnings/safe-mode errors as the
    caller that paid for the processing."""
    for ev in events:
        emit_event(options, ev["code"], ev["message"],
                   ev.get("level", "warning"))


class ActiveContext:
    __slots__ = ("mappings", "base", "original_base", "has_ctx_base",
                 "ctx_base", "vocab",
                 "default_language", "default_direction", "processing_mode",
                 "previous_context", "_inverse", "_curie_index", "_uuid",
                 "is_initial", "protected_terms")

    _counter = 0

    def __init__(self, base=None, processing_mode="json-ld-1.1"):
        self.mappings: dict[str, dict] = {}
        # STICKY per-context protection registry (context.js activeCtx
        # .protected): entries are only ever added, never removed, even
        # when a term is later redefined unprotected — the null-reset
        # guard keys off THIS map, not the current mappings
        self.protected_terms: dict[str, bool] = {}
        self.base = base
        self.original_base = base
        # True once a LOCAL context explicitly carried "@base" — the
        # reference keys compaction's base-relativization mode off
        # `'@base' in activeCtx` (compact.js:926-936): explicit @base
        # gets the ./ keyword guard, a bare options base does not
        self.has_ctx_base = False
        # the raw context-@base SLOT (activeCtx['@base']): chained by
        # later relative @base layers and re-resolved against the
        # OPTIONS base at use time (context.js:1136-1143,
        # compact.js:926-936); only meaningful when has_ctx_base
        self.ctx_base = None
        self.vocab: Optional[str] = None
        self.default_language: Optional[str] = None
        self.default_direction: Optional[str] = None
        self.processing_mode = processing_mode
        self.previous_context: Optional["ActiveContext"] = None
        self._inverse = None
        self._curie_index = None
        self.is_initial = False
        ActiveContext._counter += 1
        self._uuid = ActiveContext._counter

    def clone(self) -> "ActiveContext":
        # NOTE: default_direction is deliberately NOT copied — the
        # reference's _cloneActiveContext (context.js:1418-1439) copies
        # @base/@language/@vocab but not @direction, so the default base
        # direction silently resets on every context-object processing
        # step (a reference bug this port mirrors for parity; NOTES_r4
        # divergence #22 records the spec-correct alternative)
        c = ActiveContext(self.base, self.processing_mode)
        c.original_base = self.original_base
        c.has_ctx_base = self.has_ctx_base
        c.ctx_base = self.ctx_base
        c.mappings = dict(self.mappings)
        c.protected_terms = dict(self.protected_terms)
        c.vocab = self.vocab
        c.default_language = self.default_language
        # the previous context is CLONED too (context.js:1425-1427),
        # so the whole revert chain loses @direction the same way
        c.previous_context = (self.previous_context.clone()
                              if self.previous_context is not None
                              else None)
        return c

    def get_mapping(self, term):
        return self.mappings.get(term)

    def has_protected_terms(self) -> bool:
        return bool(self.protected_terms)

    def fingerprint(self) -> str:
        """Stable key for processed-context caching (cf. reference
        ResolvedContext per-active-context cache, lib/ResolvedContext.js:8-30).
        """
        return f"ctx:{self._uuid}"


def initial_context(options: dict) -> ActiveContext:
    ctx = ActiveContext(base=options.get("base"),
                        processing_mode=options.get(
                            "processingMode", "json-ld-1.1"))
    ctx.is_initial = True
    return ctx


def _ctx_1_1(active_ctx) -> bool:
    return active_ctx.processing_mode != "json-ld-1.0"


# ---------------------------------------------------------------------------
# Context processing (spec §4.1.2)
# ---------------------------------------------------------------------------

def _ctx_js_truthy(v) -> bool:
    """JS truthiness (containers, even empty, are truthy)."""
    if v is None or v is False:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        return v != ""
    if isinstance(v, (int, float)):
        return not (v == 0 or v != v)  # 0, -0, NaN
    return True


def process_context(active_ctx: ActiveContext, local_ctx, options: dict,
                    override_protected: bool = False,
                    propagate: bool = True,
                    validate_scoped: bool = True,
                    remote_contexts: Optional[list] = None,
                    cycles: Optional[set] = None) -> ActiveContext:
    if remote_contexts is None:
        remote_contexts = []
    if cycles is None:
        # scoped-context VALIDATION recursion guard (reference
        # context.js:410-418 `cycles` set, threaded through api.process)
        cycles = set()

    # top-level dereference chain: an object localCtx whose '@context'
    # is an ARRAY uses that array (context.js:57-61); otherwise a
    # JS-TRUTHY '@context' value replaces the wrapper at the resolver
    # (ContextResolver.js:35-37) — so {"@context": 5} processes 5
    # (-> 'invalid local context'), while a FALSY value (null/0/""/
    # false) keeps the wrapper for the per-element dereference below
    if isinstance(local_ctx, dict) and "@context" in local_ctx:
        _inner = local_ctx["@context"]
        if isinstance(_inner, list) or _ctx_js_truthy(_inner):
            local_ctx = _inner

    # whole-context processed cache: documents overwhelmingly apply the
    # SAME local context to a fresh initial context — the Ray analog of
    # the reference's ResolvedContext cache extended to inline contexts
    # (keyed by serialized context; cf. ContextResolver.js "object
    # contexts keyed by JSON.stringify"). Cached results are shared and
    # treated as immutable (process_context always clones before writes).
    resolver_for_cache = options.get("context_resolver")
    cache_key = None
    if (resolver_for_cache is not None and active_ctx.is_initial
            and not remote_contexts):
        try:
            cache_key = ("doc-ctx",
                         json.dumps(local_ctx, sort_keys=True),
                         active_ctx.base, active_ctx.processing_mode,
                         options.get("processingMode"),
                         override_protected, propagate, validate_scoped)
        except (TypeError, ValueError):
            cache_key = None
        if cache_key is not None:
            cached = resolver_for_cache.get_processed(cache_key)
            if cached is not None:
                processed, captured = cached
                _replay_events(options, captured)
                return processed

    # capture events emitted while building a cacheable result so a
    # cache hit can REPLAY them to its caller (misc.js 'cached context
    # event replay'); the capture dict shares everything but _events
    outer_options = options
    if cache_key is not None:
        options = dict(options)
        options["_events"] = []

    ctxs = local_ctx if isinstance(local_ctx, list) else [local_ctx]
    result = active_ctx

    # 2) @propagate override from an object member
    if (len(ctxs) == 1 and isinstance(ctxs[0], dict)
            and "@propagate" in ctxs[0]):
        propagate = ctxs[0]["@propagate"]

    if not propagate and result.previous_context is None:
        result = result.clone()
        result.previous_context = active_ctx

    for ctx in ctxs:
        if ctx is None:
            # 5.1: null context → reset to initial (keep base)
            if (not override_protected and result.has_protected_terms()):
                raise JsonLdError(
                    "Tried to nullify a context with protected term "
                    "definitions.", "invalid context nullification")
            prev = result if not propagate else None
            # the reset UNPINS the processing mode: the reference's
            # getInitialContext here sees context-processing options
            # without processingMode, so @version 1.1 after a null
            # reset does NOT conflict even under an explicit
            # processingMode=json-ld-1.0 (context.js:130,1207-1214;
            # probed against the reference — fuzz seed 138)
            result = ActiveContext(
                base=active_ctx.original_base,
                processing_mode="json-ld-1.1")
            result.original_base = active_ctx.original_base
            if prev is not None:
                result.previous_context = prev
            continue

        if isinstance(ctx, str):
            # remote context
            resolver = options.get("context_resolver")
            base_iri = options.get("_context_base", options.get("base"))
            url = prepend_base(base_iri, ctx)
            # cycle/overflow codes are mode-dependent (reference
            # ContextResolver.js:133-157): 1.0 keeps the legacy codes,
            # 1.1 reports 'context overflow' for both
            _is10 = (getattr(result, "processing_mode", None)
                     or options.get("processingMode")) == "json-ld-1.0"
            if url in remote_contexts:
                raise JsonLdError(
                    f"Cyclical @context URLs detected: {url}",
                    "recursive context inclusion" if _is10
                    else "context overflow")
            if len(remote_contexts) >= 10:
                raise JsonLdError(
                    "Maximum number of @context URLs exceeded.",
                    "loading remote context failed" if _is10
                    else "context overflow")
            if resolver is None:
                raise JsonLdError(
                    f"No context resolver configured; cannot dereference "
                    f"remote context {url!r}.", "loading remote context failed")
            # processed-context cache: (url, active fingerprint)
            url_key = (url, result.fingerprint(), override_protected,
                       propagate)
            cached = resolver.get_processed(url_key)
            if cached is not None:
                processed, captured = cached
                # cached context event replay (handlers run again)
                _replay_events(options, captured)
                result = processed
                continue
            remote_doc = resolver.resolve(url)
            loaded_ctx = remote_doc["context"]
            inner_opts = dict(options)
            inner_opts["_context_base"] = remote_doc.get("documentUrl", url)
            inner_opts["_events"] = []
            processed = process_context(
                result, loaded_ctx, inner_opts,
                override_protected=override_protected,
                propagate=propagate,
                validate_scoped=validate_scoped,
                remote_contexts=remote_contexts + [url])
            captured = inner_opts["_events"]
            resolver.put_processed(url_key, (processed, list(captured)))
            # handlers already ran live — only accumulate upward
            options.setdefault("_events", []).extend(captured)
            result = processed
            continue

        # per-element dereference: an object entry carrying an
        # '@context' key (no truthiness gate) unwraps to that value,
        # which must then be a plain object — by this point all URLs
        # were resolved, so a string/array/null here is an error
        # (context.js:148-157)
        if isinstance(ctx, dict) and "@context" in ctx:
            ctx = ctx["@context"]

        if not isinstance(ctx, dict):
            raise JsonLdError(
                "@context must be an object.", "invalid local context")

        result = result.clone()
        result._inverse = None

        # the reference tracks handled keywords in the `defined` map
        # shared with the term loop (context.js:163-397): each keyword
        # block marks its key True; the term loop has NO skip-list, so
        # a keyword key NOT marked (e.g. one merged in by @import, or
        # a FALSY top-level @protected — defined.set('@protected',
        # ctx['@protected'] || false), context.js:395) reaches
        # createTermDefinition and throws keyword-redefinition /
        # 'cyclic IRI mapping' respectively
        defined: dict[str, bool] = {}

        # @version
        if "@version" in ctx:
            v = ctx["@version"]
            if v != 1.1:
                raise JsonLdError(
                    "Unsupported JSON-LD version: " + str(v),
                    "invalid @version value")
            # the pin lives on the ACTIVE CONTEXT, not the option
            # (context.js:177-183) — a null reset clears it
            if result.processing_mode == "json-ld-1.0":
                raise JsonLdError(
                    "@version not supported in JSON-LD 1.0 mode",
                    "processing mode conflict")
            result.processing_mode = "json-ld-1.1"
            defined["@version"] = True

        # @base — only honored in non-remote (top-level) contexts per spec;
        # we honor it whenever present (the reference does the same for
        # embedded contexts)
        if "@base" in ctx:
            base = ctx["@base"]
            # capture the previous slot BEFORE marking this layer —
            # has_ctx_base may already be True from an earlier layer
            had_ctx_base = result.has_ctx_base
            result.has_ctx_base = True
            # reference context.js:195-210: null and absolute pass
            # through; ANY other string is "relative" (url.js:301
            # isRelative = isString) and goes through prependBase —
            # whose null-base arm returns the RELATIVE STRING verbatim
            # as the new base (url.js:65-67); only non-strings throw
            if base is None:
                slot = None
            elif not isinstance(base, str):
                raise JsonLdError(
                    "@base must be a string or null.", "invalid base IRI")
            elif is_absolute_iri(base):
                slot = base
            else:
                # a relative @base chains against the PREVIOUS SLOT
                # value (context.js:201 prependBase(rval['@base'],
                # base)): absent slot -> empty-base resolution
                # (prependBase(undefined, ...)), null slot -> the
                # relative string VERBATIM (url.js:65-67)
                prev = (result.ctx_base if had_ctx_base
                        else DeletedBase(""))
                slot = prepend_base(prev, base)
            result.ctx_base = slot
            # effective EXPANSION base: a truthy slot re-resolves
            # against the OPTIONS base at use time (context.js:
            # 1136-1143 prependBase(options.base, activeCtx['@base']));
            # falsy (null/'') keeps values unresolved — eager here
            # because options.base is fixed for the context's lifetime
            result.base = (prepend_base(result.original_base, slot)
                           if slot else slot)
            defined["@base"] = True

        # @vocab
        if "@vocab" in ctx:
            vocab = ctx["@vocab"]
            if vocab is None:
                result.vocab = None
            elif not isinstance(vocab, str):
                raise JsonLdError("@vocab must be a string or null.",
                                  "invalid vocab mapping")
            elif vocab.startswith("_:") and not _ctx_1_1(result):
                raise JsonLdError(
                    "blank-node @vocab requires JSON-LD 1.1.",
                    "invalid vocab mapping")
            else:
                expanded = expand_iri(
                    result, vocab, vocab_mode=True, base_mode=True,
                    options=options)
                if expanded is None or (not is_absolute_iri(expanded)
                                        and not _ctx_1_1(result)):
                    raise JsonLdError(
                        "@vocab must be an absolute IRI.",
                        "invalid vocab mapping")
                if expanded is not None and not is_absolute_iri(expanded):
                    emit_event(options, "relative @vocab reference",
                               f"Relative @vocab reference: {vocab!r}")
                result.vocab = expanded
            defined["@vocab"] = True

        # @language
        if "@language" in ctx:
            lang = ctx["@language"]
            if lang is None:
                result.default_language = None
            elif not isinstance(lang, str):
                raise JsonLdError("@language must be a string or null.",
                                  "invalid default language")
            else:
                if not BCP47_RE.match(lang):
                    # warning event, value still used (context.js:264-280)
                    emit_event(options or {}, "invalid @language value",
                               "@language value must be valid BCP47.")
                result.default_language = lang.lower()
            defined["@language"] = True

        # @direction
        if "@direction" in ctx:
            if not _ctx_1_1(result):
                # NOTE: this one is 'member', not 'entry'
                # (context.js:288-293)
                raise JsonLdError("@direction requires JSON-LD 1.1.",
                                  "invalid context member")
            direction = ctx["@direction"]
            if direction is None:
                result.default_direction = None
            elif direction not in ("ltr", "rtl"):
                raise JsonLdError('@direction must be "ltr" or "rtl".',
                                  "invalid base direction")
            else:
                result.default_direction = direction
            defined["@direction"] = True

        if "@propagate" in ctx:
            if not _ctx_1_1(result):
                raise JsonLdError("@propagate requires JSON-LD 1.1.",
                                  "invalid context entry")
            if not isinstance(ctx["@propagate"], bool):
                raise JsonLdError("@propagate must be boolean.",
                                  "invalid @propagate value")
            defined["@propagate"] = True

        # @import (1.1) — processed AFTER @base/@vocab/@language/
        # @direction/@propagate (context.js:329-390): imported keys
        # merge into ctx only where absent, so an imported KEYWORD is
        # never seen by the keyword handlers above — it falls into the
        # term loop and throws keyword-redefinition (wave-12 parity;
        # this also puts the @vocab validation BEFORE the @import one,
        # corrupt fuzz seed 5361)
        if "@import" in ctx:
            imp = ctx["@import"]
            if not _ctx_1_1(result):
                raise JsonLdError("@import requires JSON-LD 1.1.",
                                  "invalid context entry")
            if not isinstance(imp, str):
                raise JsonLdError("@import must be a string.",
                                  "invalid @import value")
            resolver = options.get("context_resolver")
            if resolver is None:
                raise JsonLdError("No context resolver for @import.",
                                  "loading remote context failed")
            # a RELATIVE @import resolves against OPTIONS.BASE — the
            # document base, NOT the enclosing remote context's URL
            # (context.js:347-352 passes base: options.base; the
            # fetch-time context-URL rewrite does not cover @import) —
            # wave-16 probe, fixture via remote leg
            url = prepend_base(options.get("base"), imp)
            imported = resolver.resolve(url)["context"]
            if not isinstance(imported, dict):
                raise JsonLdError(
                    "@import must reference a context object.",
                    "invalid remote context")
            if "@import" in imported:
                raise JsonLdError(
                    "imported context must not include @import.",
                    "invalid context entry")
            merged = dict(ctx)
            for k, v in imported.items():
                if k not in merged:
                    merged[k] = v
            ctx = merged
            defined["@import"] = True

        protected_default = ctx.get("@protected", False)
        # raw truthiness, reference context.js:395 — a FALSY value
        # (false/0/'') leaves '@protected' un-skipped for the term
        # loop, where it hits the defined-map cycle check
        defined["@protected"] = bool(ctx["@protected"]) \
            if "@protected" in ctx else True

        for term in ctx.keys():
            if term in ("@base", "@vocab", "@language", "@direction",
                        "@version", "@propagate", "@import"):
                # keys the keyword handlers marked in `defined` are
                # skipped there; anything else (an imported keyword)
                # must flow into createTermDefinition
                if defined.get(term):
                    continue
            if term == "@protected" and defined.get(term):
                continue
            create_term_definition(
                result, ctx, term, defined, options,
                protected=protected_default,
                override_protected=override_protected,
                validate_scoped=validate_scoped,
                remote_contexts=remote_contexts)
            # eagerly VALIDATE a term's scoped context by processing it
            # against a CLONE of the result (context.js:407-440): an
            # invalid scoped context raises at DEFINITION time, term
            # used or not. Use-time processing still happens lazily.
            # The validation pass strips the eventHandler (no double
            # emission to user handlers) but keeps safe mode, whose
            # in-context errors surface here wrapped like every other
            # failure (corrupt fuzz seeds 0/13/315).
            term_val = ctx.get(term)
            if isinstance(term_val, dict) and "@context" in term_val:
                key_ctx = term_val["@context"]
                do_validate = True
                if isinstance(key_ctx, str):
                    url = prepend_base(options.get("base"), key_ctx)
                    if url in cycles:
                        do_validate = False
                    else:
                        cycles.add(url)
                if do_validate:
                    vopts = {k: v for k, v in options.items()
                             if k not in ("_events", "eventHandler")}
                    try:
                        process_context(result.clone(), key_ctx, vopts,
                                        override_protected=True,
                                        remote_contexts=remote_contexts,
                                        cycles=cycles)
                    except JsonLdError:
                        raise JsonLdError(
                            f"Invalid scoped context for term {term!r}.",
                            "invalid scoped context")
    if cache_key is not None and resolver_for_cache is not None:
        captured = options.get("_events", [])
        resolver_for_cache.put_processed(cache_key, (result, list(captured)))
        # handlers already ran live during processing — only ACCUMULATE
        # into the caller; handler replay happens on cache hits
        outer_options.setdefault("_events", []).extend(captured)
    return result


# container value validation sets
_CONTAINER_COMBOS_11 = [
    {"@list"}, {"@set"}, {"@index"}, {"@index", "@set"},
    {"@language"}, {"@language", "@set"}, {"@graph"},
    {"@graph", "@id"}, {"@graph", "@index"},
    {"@graph", "@id", "@set"}, {"@graph", "@index", "@set"},
    {"@graph", "@set"}, {"@id"}, {"@id", "@set"},
    {"@type"}, {"@type", "@set"},
]


def create_term_definition(active_ctx: ActiveContext, local_ctx: dict,
                           term: str, defined: dict, options: dict,
                           protected: bool = False,
                           override_protected: bool = False,
                           validate_scoped: bool = True,
                           remote_contexts: Optional[list] = None):
    """Create Term Definition algorithm (spec §4.2.2)."""
    if term in defined:
        if defined[term]:
            return
        raise JsonLdError(
            f"Cyclical context definition detected for term {term!r}.",
            "cyclic IRI mapping")
    defined[term] = False

    value = local_ctx[term]

    if (term == "@type" and isinstance(value, dict)
            and value.get("@container", "@set") == "@set"
            and _ctx_1_1(active_ctx)):
        # 1.1 allows redefining @type; the reference accepts exactly the
        # keys @container/@id/@protected here (context.js:494-506) — any
        # other shape falls through to the keyword-redefinition error
        valid_keys = {"@container", "@id", "@protected"}
        if not value or any(k not in valid_keys for k in value):
            raise JsonLdError("Invalid @type redefinition.",
                              "keyword redefinition")
    elif is_keyword(term):
        raise JsonLdError(f"Keywords cannot be overridden: {term!r}",
                          "keyword redefinition")
    elif is_keyword_like(term):
        emit_event(options, "reserved term",
                   f"Terms beginning with '@' are reserved: {term!r}")
        defined[term] = True
        return
    elif term == "":
        raise JsonLdError("A term cannot be an empty string.",
                          "invalid term definition")

    prev_mapping = active_ctx.mappings.get(term)
    if term in active_ctx.mappings:
        del active_ctx.mappings[term]

    simple_term = False
    if value is None:
        value = {"@id": None}
    elif isinstance(value, str):
        simple_term = True
        value = {"@id": value}
    elif not isinstance(value, dict):
        raise JsonLdError(
            "Term definition must be null, a string, or an object.",
            "invalid term definition")

    # protection is decided by the strict-boolean block below
    # (context.js:751-754); the ctx-level default arrives via the
    # `protected` param and only counts when it is the literal True
    mapping: dict[str, Any] = {"reverse": False, "protected": False,
                               "_prefix": False,
                               "_term_has_colon": ":" in term[1:]}

    # a term definition may only contain the expected keywords; the 1.1
    # additions are invalid in 1.0 mode (cf. reference context.js:566-581)
    _term_valid_keys = {"@container", "@id", "@language", "@reverse",
                        "@type"}
    if _ctx_1_1(active_ctx):
        _term_valid_keys |= {"@context", "@direction", "@index", "@nest",
                             "@prefix", "@protected"}
    for _kw in value:
        if _kw not in _term_valid_keys:
            raise JsonLdError(
                f"A term definition must not contain {_kw}.",
                "invalid term definition")

    if "@protected" in value and not _ctx_1_1(active_ctx):
        raise JsonLdError("@protected requires JSON-LD 1.1.",
                          "invalid term definition")
    # JS strict-equality semantics (context.js:751-754): only the
    # literal boolean true protects; a truthy non-boolean ("yes", 5)
    # is silently ignored, and @protected: false opts out of a
    # context-level @protected: true default (which itself must be
    # the literal true)
    if (value.get("@protected") is True
            or (protected is True
                and value.get("@protected") is not False)):
        mapping["protected"] = True
        active_ctx.protected_terms[term] = True

    if "@reverse" in value:
        if "@id" in value:
            raise JsonLdError("@reverse term cannot contain @id.",
                              "invalid reverse property")
        if "@nest" in value:
            raise JsonLdError("@reverse term cannot contain @nest.",
                              "invalid reverse property")
        rev = value["@reverse"]
        if not isinstance(rev, str):
            raise JsonLdError("@reverse value must be a string.",
                              "invalid IRI mapping")
        if is_keyword_like(rev):
            emit_event(options, "reserved @reverse value",
                       f"@reverse values beginning with '@' are reserved: "
                       f"{rev!r}")
            if prev_mapping is not None:
                active_ctx.mappings[term] = prev_mapping
            defined[term] = True
            return
        iri = expand_iri(active_ctx, rev, vocab_mode=True,
                        local_ctx=local_ctx, defined=defined, options=options)
        if iri is None or not (is_absolute_iri(iri) or iri.startswith("_:")):
            raise JsonLdError("@reverse must expand to an absolute IRI.",
                              "invalid IRI mapping")
        mapping["@id"] = iri
        mapping["reverse"] = True
        if "@container" in value:
            c = value["@container"]
            if c not in ("@set", "@index", None):
                raise JsonLdError(
                    "reverse term @container must be @set or @index.",
                    "invalid reverse property")
            if c is not None:
                mapping["@container"] = [c]
    elif "@id" in value:
        idv = value["@id"]
        if idv is None:
            mapping["@id"] = None
        elif not isinstance(idv, str):
            raise JsonLdError("@id mapping must be a string.",
                              "invalid IRI mapping")
        elif idv != term:
            if not is_keyword(idv) and is_keyword_like(idv):
                emit_event(options, "reserved @id value",
                           f"@id values beginning with '@' are reserved: "
                           f"{idv!r}")
                if prev_mapping is not None:
                    active_ctx.mappings[term] = prev_mapping
                defined[term] = True
                return
            if idv == "@type":
                mapping["@id"] = "@type"
            elif is_keyword(idv):
                mapping["@id"] = idv
            else:
                iri = expand_iri(active_ctx, idv, vocab_mode=True,
                                local_ctx=local_ctx, defined=defined,
                                options=options)
                if iri is None or not (is_absolute_iri(iri)
                                       or iri.startswith("_:")
                                       or is_keyword(iri)):
                    raise JsonLdError(
                        f"@id mapping for {term!r} must expand to an IRI, "
                        "blank node, or keyword.", "invalid IRI mapping")
                # a term that itself has IRI form (CURIE-like or with a
                # slash) must expand to the SAME IRI as its declared @id
                # (cf. reference context.js:692-705)
                if _IRI_FORM_TERM_RE.search(term):
                    term_defined = dict(defined)
                    term_defined[term] = True
                    term_iri = expand_iri(
                        active_ctx, term, vocab_mode=True,
                        local_ctx=local_ctx, defined=term_defined,
                        options=options)
                    if term_iri != iri:
                        raise JsonLdError(
                            "Term in form of IRI must expand to its own "
                            "definition.", "invalid IRI mapping")
                mapping["@id"] = iri
                # simple term ending in a gen-delim char may be a prefix
                if (simple_term and
                        (iri[-1] in ":/?#[]@" or iri.startswith("_:"))):
                    mapping["_prefix"] = True
                elif not simple_term:
                    mapping["_prefix"] = bool(value.get("@prefix", False))

    if "@id" not in mapping:
        # derive from compact-IRI term or @vocab
        if ":" in term[1:]:
            prefix, _, suffix = term.partition(":")
            if prefix in local_ctx:
                create_term_definition(active_ctx, local_ctx, prefix,
                                       defined, options,
                                       override_protected=override_protected,
                                       validate_scoped=validate_scoped,
                                       remote_contexts=remote_contexts)
            pm = active_ctx.mappings.get(prefix)
            if pm is not None and pm.get("@id") is not None:
                mapping["@id"] = pm["@id"] + suffix
            else:
                mapping["@id"] = term
        elif term.startswith("/"):
            raise JsonLdError("Term must not begin with '/'.",
                              "invalid term definition")
        elif term == "@type":
            mapping["@id"] = "@type"
        else:
            if active_ctx.vocab is None:
                raise JsonLdError(
                    f"Term {term!r} has no IRI mapping and no @vocab is "
                    "set.", "invalid IRI mapping")
            mapping["@id"] = active_ctx.vocab + term

    if "@type" in value:
        t = value["@type"]
        if not isinstance(t, str):
            raise JsonLdError("@type mapping must be a string.",
                              "invalid type mapping")
        if t in ("@json", "@none"):
            if not _ctx_1_1(active_ctx):
                raise JsonLdError(f"{t} type mapping requires JSON-LD 1.1.",
                                  "invalid type mapping")
        elif t not in ("@id", "@vocab"):
            t = expand_iri(active_ctx, t, vocab_mode=True,
                          local_ctx=local_ctx, defined=defined,
                          options=options)
            if t is None or not is_absolute_iri(t):
                raise JsonLdError("@type mapping must expand to an IRI.",
                                  "invalid type mapping")
            if t.startswith("_:"):
                raise JsonLdError(
                    "@type mapping must not be a blank node.",
                    "invalid type mapping")
        mapping["@type"] = t

    if "@container" in value:
        c = value["@container"]
        container = c if isinstance(c, list) else [c]
        cset = set(container)
        if not _ctx_1_1(active_ctx):
            # 1.0: must be a bare STRING (an array is invalid even with
            # one element) from the 1.0 container set
            # (cf. reference context.js:853-859)
            if (isinstance(c, list) or len(container) != 1
                    or container[0] not in
                    ("@list", "@set", "@index", "@language")):
                raise JsonLdError(
                    "Invalid @container in JSON-LD 1.0 mode.",
                    "invalid container mapping")
        else:
            if cset not in _CONTAINER_COMBOS_11:
                raise JsonLdError(
                    f"Invalid @container value for term {term!r}: {c!r}",
                    "invalid container mapping")
        if mapping["reverse"] and not cset <= {"@index", "@set"}:
            raise JsonLdError(
                "reverse term @container must be @index or @set.",
                "invalid reverse property")
        mapping["@container"] = container
        if "@type" in cset:
            # spec §4.2.2: @container:@type implies @type:@id (so bare
            # strings in a type map expand to node references); an
            # explicit type mapping must be @id or @vocab
            mapping.setdefault("@type", "@id")
            if mapping["@type"] not in ("@id", "@vocab"):
                raise JsonLdError(
                    "@container:@type requires @type of @id or @vocab.",
                    "invalid type mapping")
    else:
        mapping["@container"] = []

    if "@index" in value:
        if "@container" not in value or "@index" not in mapping["@container"]:
            raise JsonLdError(
                "@index requires @container:@index.",
                "invalid term definition")
        idx = value["@index"]
        # the reference validates ONLY string + not-@-prefixed here
        # (context.js:894-899) — despite its error text, IRI expansion
        # of the index key happens lazily at expand time
        if not isinstance(idx, str) or idx.startswith("@"):
            raise JsonLdError("@index must expand to an IRI.",
                              "invalid term definition")
        mapping["@index"] = idx

    if "@context" in value:
        if not _ctx_1_1(active_ctx):
            raise JsonLdError("scoped contexts require JSON-LD 1.1.",
                              "invalid term definition")
        mapping["@context"] = value["@context"]

    if "@language" in value and "@type" not in value:
        lang = value["@language"]
        if lang is not None and not isinstance(lang, str):
            raise JsonLdError("@language must be a string or null.",
                              "invalid language mapping")
        mapping["@language"] = lang.lower() if isinstance(lang, str) else None
        mapping["_has_language"] = True

    if "@direction" in value and "@type" not in value:
        d = value["@direction"]
        if d is not None and d not in ("ltr", "rtl"):
            raise JsonLdError('@direction must be "ltr", "rtl", or null.',
                              "invalid base direction")
        mapping["@direction"] = d
        mapping["_has_direction"] = True

    if "@prefix" in value:
        if ":" in term[1:] or "/" in term:
            raise JsonLdError("@prefix used on a compact IRI term.",
                              "invalid term definition")
        if not isinstance(value["@prefix"], bool):
            raise JsonLdError("@prefix must be boolean.",
                              "invalid @prefix value")
        if is_keyword(mapping.get("@id")):
            raise JsonLdError("Keyword mappings cannot be prefixes.",
                              "invalid term definition")
        mapping["_prefix"] = value["@prefix"]

    if "@nest" in value:
        nest = value["@nest"]
        if (not isinstance(nest, str)
                or (nest != "@nest" and nest.startswith("@"))):
            raise JsonLdError(
                '@nest must be "@nest" or a term mapping to "@nest".',
                "invalid @nest value")
        mapping["@nest"] = nest

    # unknown entries
    for k in value:
        if k not in ("@id", "@reverse", "@type", "@container", "@language",
                     "@direction", "@context", "@prefix", "@nest", "@index",
                     "@protected"):
            raise JsonLdError(
                f"Invalid term definition entry {k!r} for term {term!r}.",
                "invalid term definition")

    # protected redefinition check — the attempt itself re-marks the
    # term in the sticky registry and forces the new mapping protected
    # (context.js:981-991) before the deep compare decides
    if (prev_mapping is not None and prev_mapping.get("protected")
            and not override_protected):
        active_ctx.protected_terms[term] = True
        mapping["protected"] = True
        cmp_prev = {k: v for k, v in prev_mapping.items()
                    if k != "protected"}
        cmp_new = {k: v for k, v in mapping.items() if k != "protected"}
        if cmp_prev != cmp_new:
            raise JsonLdError(
                f"Tried to redefine protected term {term!r}.",
                "protected term redefinition")
        mapping = prev_mapping

    active_ctx.mappings[term] = mapping
    defined[term] = True


# ---------------------------------------------------------------------------
# IRI expansion (spec §4.2.3; cf. reference context.js:1033-1197)
# ---------------------------------------------------------------------------

def expand_iri(active_ctx: ActiveContext, value, *,
               vocab_mode: bool = False, base_mode: bool = False,
               local_ctx: Optional[dict] = None,
               defined: Optional[dict] = None,
               options: Optional[dict] = None):
    options = options or {}
    if value is None or is_keyword(value):
        return value
    if not isinstance(value, str):
        return value

    # keyword-lookalike values expand to null SILENTLY here — events for
    # reserved values are emitted at specific call sites only (term
    # definition, @id/@reverse values; cf. reference context.js:1039-1042)
    if is_keyword_like(value):
        return None

    # define term if in local context being processed
    if (local_ctx is not None and value in local_ctx
            and defined is not None and not defined.get(value)):
        create_term_definition(active_ctx, local_ctx, value, defined, options)

    if vocab_mode:
        m = active_ctx.mappings.get(value)
        if m is not None:
            return m["@id"]

    if ":" in value[1:]:
        prefix, _, suffix = value.partition(":")
        # already absolute or blank node
        if prefix == "_":
            return value
        if suffix.startswith("//"):
            return value  # IRI with authority — not a compact IRI
        if (local_ctx is not None and prefix in local_ctx
                and defined is not None and not defined.get(prefix)):
            create_term_definition(active_ctx, local_ctx, prefix, defined,
                                   options)
        pm = active_ctx.mappings.get(prefix)
        if pm is not None and pm.get("@id") is not None and pm.get("_prefix"):
            return pm["@id"] + suffix
        if is_absolute_iri(value):
            return value

    if vocab_mode and active_ctx.vocab is not None:
        return active_ctx.vocab + value
    if base_mode:
        # three modes (context.js:1132-1147):
        # - a LOCAL context set @base: falsy (@base null) preserves the
        #   value unresolved, truthy resolves against it;
        # - no local @base: resolve against OPTIONS base, where null
        #   preserves but the EMPTY string (a DELETED base — the
        #   compactToRelative=false state, and jsonld.js's default for
        #   non-string input) resolves against the empty base
        #   ('' -> './', 'rel/../dot' -> 'dot'; fuzz seed 240)
        if active_ctx.has_ctx_base and not active_ctx.base:
            return value
        return prepend_base(active_ctx.base, value)
    return value
