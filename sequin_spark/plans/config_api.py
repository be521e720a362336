"""Management/config REST API — plan / apply / export over the spec layer.

Reference: router.ex:191-193 (``POST /api/config/plan``, ``POST
/api/config/apply``, ``GET /api/config/export``) backed by
yaml_controller.ex (apply → ``{"resources": [...]}``, plan →
``{"changes": [...]}`` envelopes with create/update/delete actions,
export → ``{"yaml": ...}``) and yaml_loader.ex's plan/apply split.

stdlib http.server, same shell as streaming/pull_api.py. Applied specs
live in an in-memory registry keyed by name — plan diffs the submitted
YAML against it (create / update / unchanged, plus deletes for
registry entries absent from the submitted doc), apply commits it.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from sequin_spark.plans.spec import (
    ConsumerSpec,
    FunctionSpec,
    check_references,
    export_yaml,
    function_to_external,
    load_config,
    resolve_consumer,
    to_external,
)


class ConfigRegistry:
    """Applied resources, keyed by name: sink consumers + named
    functions (yaml_loader.ex:170 upserts functions before consumers so
    name references resolve)."""

    def __init__(self, backfills=None):
        self.consumers: dict[str, ConsumerSpec] = {}
        self.functions: dict[str, FunctionSpec] = {}
        # optional BackfillManager: when wired, a spec's
        # initial_backfill directive starts backfill jobs at sink
        # CREATION time (yaml_loader.ex initial_backfill; never on
        # update — yaml_loader_test.exs:2519).  Without a manager the
        # directive still shape-validates but starts nothing (no
        # snapshot source to read from).
        self.backfills = backfills
        self._lock = threading.Lock()

    @staticmethod
    def _merge_errors(errors: dict, extra: dict) -> None:
        for name, errs in extra.items():
            errors.setdefault(name, []).extend(errs)

    def plan(self, specs: list[ConsumerSpec],
             functions: list[FunctionSpec] | None = None) -> dict:
        """Diff envelopes (yaml_controller.ex plan: action per resource)."""
        changes, errors = [], {}
        with self._lock:
            fn_scope = dict(self.functions)
            if functions is not None:
                fn_scope = {f.name: f for f in functions}
                seen_fn = set()
                for f in functions:
                    seen_fn.add(f.name)
                    errs = f.validate()
                    if errs:
                        errors[f.name] = errs
                    current = self.functions.get(f.name)
                    action = ("create" if current is None
                              else "update" if current != f else "unchanged")
                    changes.append(
                        {"resource": "function", "name": f.name,
                         "action": action,
                         "new": function_to_external(f),
                         "old": function_to_external(current)
                         if current else None})
                for name in self.functions:
                    if name not in seen_fn:
                        changes.append(
                            {"resource": "function", "name": name,
                             "action": "delete", "new": None,
                             "old": function_to_external(self.functions[name])})
            seen = set()
            for s in specs:
                seen.add(s.name)
                errs = s.validate()
                if errs:
                    errors[s.name] = errs
                current = self.consumers.get(s.name)
                if current is None:
                    action = "create"
                elif current != s:
                    action = "update"
                else:
                    action = "unchanged"
                changes.append(
                    {"resource": "sink_consumer", "name": s.name, "action": action,
                     "new": to_external(s),
                     "old": to_external(current) if current else None}
                )
            for name in self.consumers:
                if name not in seen:
                    changes.append(
                        {"resource": "sink_consumer", "name": name,
                         "action": "delete",
                         "new": None, "old": to_external(self.consumers[name])}
                    )
            self._merge_errors(errors, check_references(specs, fn_scope))
        return {"changes": changes, "errors": errors}

    @staticmethod
    def _backfill_plans(spec: ConsumerSpec) -> tuple[list, list[str]]:
        """Expand a spec's initial_backfill directive into
        (table_ref, sort_column, start_position) triples.  ``true``
        targets the sink's single source table; the list form is
        explicit per-table (shape already checked by spec.validate)."""
        ib = spec.initial_backfill
        if not ib:
            return [], []
        if ib is True:
            tabs = (spec.source.include_tables
                    if spec.source is not None else None)
            if not tabs or len(tabs) != 1:
                return [], [
                    "initial_backfill: true requires a source with "
                    "exactly one include_tables entry"]
            return [(tabs[0], None, None)], []
        return [(e["table"], e.get("sort_column"), e.get("start_position"))
                for e in ib if isinstance(e, dict) and e.get("table")], []

    def _initial_backfill_errors(self, spec: ConsumerSpec) -> list[str]:
        """Pre-commit validation of the directive's targets against the
        wired BackfillManager (invalid table / sort column fail the
        apply atomically — yaml_loader_test.exs:2564,2582)."""
        plans, errs = self._backfill_plans(spec)
        if self.backfills is not None:
            for table, sort_col, _ in plans:
                err = self.backfills.validate_ref(table, sort_col)
                if err:
                    errs.append(err)
        return errs

    def _start_initial_backfills(self, spec: ConsumerSpec) -> None:
        if self.backfills is None:
            return
        for table, sort_col, start in self._backfill_plans(spec)[0]:
            self.backfills.create(spec.name, table,
                                  sort_column=sort_col,
                                  start_position=start)

    def apply(self, specs: list[ConsumerSpec],
              functions: list[FunctionSpec] | None = None) -> dict:
        """Validate-all-then-commit (apply_from_yml: nothing is created
        if any resource fails validation). ``functions=None`` leaves the
        stored functions untouched (programmatic consumer-only apply);
        a list replaces them wholesale like consumers."""
        errors = {s.name: s.validate() for s in specs if s.validate()}
        with self._lock:
            existing = set(self.consumers)
        # initial_backfill acts only at creation; validate its targets
        # only for sinks this apply would CREATE
        to_backfill = [s for s in specs
                       if s.name not in existing and s.initial_backfill]
        for s in to_backfill:
            errs = self._initial_backfill_errors(s)
            if errs:
                errors.setdefault(s.name, []).extend(errs)
        if functions is not None:
            for f in functions:
                errs = f.validate()
                if errs:
                    errors.setdefault(f.name, []).extend(errs)
        fn_scope = ({f.name: f for f in functions} if functions is not None
                    else self.functions)
        self._merge_errors(errors, check_references(specs, fn_scope))
        if errors:
            return {"errors": errors}
        with self._lock:
            if functions is not None:
                self.functions = {f.name: f for f in functions}
            self.consumers = {s.name: s for s in specs}
            resources = [
                {"resource": "function", **function_to_external(f)}
                for f in (functions or [])
            ] + [
                {"resource": "sink_consumer", **to_external(s)} for s in specs
            ]
        # after commit: start the validated creation-time backfills
        # (job startup reads the snapshot source — keep it off the lock)
        for s in to_backfill:
            self._start_initial_backfills(s)
        return {"resources": resources}

    def resolved_consumer(self, name: str) -> ConsumerSpec | None:
        """Consumer with function-name references replaced by their code
        — what the runtime pipeline consumes (the reference joins
        consumers to functions by *_id at load)."""
        with self._lock:
            spec = self.consumers.get(name)
            if spec is None:
                return None
            return resolve_consumer(spec, self.functions)

    def export(self, show_sensitive: bool = False) -> str:
        with self._lock:
            return export_yaml(list(self.consumers.values()), show_sensitive,
                               functions=list(self.functions.values()))

    # -- single-resource CRUD (sink_consumer_controller.ex create/
    # update/delete: external body → from_external → validate → commit) --

    def create_consumer(self, body: dict) -> ConsumerSpec:
        spec = self._parse(body)
        errs = self._initial_backfill_errors(spec)
        if errs:
            raise ValueError("; ".join(errs))
        with self._lock:
            if spec.name in self.consumers:
                raise ValueError(f"sink consumer {spec.name!r} already exists")
            self.consumers[spec.name] = spec
        self._start_initial_backfills(spec)
        return spec

    def update_consumer(self, id_or_name: str, body: dict) -> ConsumerSpec:
        """Merge the submitted external fields over the stored external
        form, then re-parse — partial updates, like update_sink_consumer
        over cleaned_params."""
        with self._lock:
            current = self.consumers.get(id_or_name)
            if current is None:
                raise KeyError(id_or_name)
            merged = {**to_external(current, show_sensitive=True), **body}
            spec = self._parse(merged)
            if spec.name != id_or_name:
                # Renaming onto another existing consumer would silently
                # overwrite it (create rejects duplicates; so must update).
                if spec.name in self.consumers:
                    raise ValueError(
                        f"sink consumer {spec.name!r} already exists")
                self.consumers.pop(id_or_name, None)
            self.consumers[spec.name] = spec
        return spec

    def delete_consumer(self, id_or_name: str) -> str:
        with self._lock:
            if id_or_name not in self.consumers:
                raise KeyError(id_or_name)
            del self.consumers[id_or_name]
        return id_or_name

    @staticmethod
    def _parse(body: dict) -> ConsumerSpec:
        from sequin_spark.plans.spec import spec_from_dict

        try:
            spec = spec_from_dict(body)
        except TypeError as e:  # unknown field → from_external rejection
            raise ValueError(f"invalid sink consumer: {e}") from None
        if not spec.name:
            raise ValueError("name is required")
        errs = spec.validate()
        if errs:
            raise ValueError("; ".join(errs))
        return spec


class ConfigApiServer:
    def __init__(self, registry: ConfigRegistry | None = None,
                 host: str = "127.0.0.1", port: int = 0,
                 backfills=None, databases=None, endpoints=None,
                 api_keys=None, api_tokens=None, require_auth=False,
                 replications=None, health_check=None,
                 messages=None, users=None, tracer=None, spark=None,
                 pull=None, version: str = "0.3.0"):
        """``backfills``: optional plans.backfill_api.BackfillManager —
        enables the /api/sinks/:name/backfills management routes
        (router.ex:173, backfill_controller.ex).
        ``databases``: optional plans.database_api.DatabaseRegistry —
        enables the /api/postgres_databases resource routes
        (router.ex:160,175-178, postgres_database_controller.ex).
        ``endpoints``: optional plans.endpoints_api.HttpEndpointRegistry —
        enables /api/destinations/http_endpoints (router.ex:168).
        ``api_keys``: optional plans.apikeys_api.ApiKeyRegistry — enables
        /api/api_keys (router.ex:161); with ``require_auth=True`` every
        request must carry ``Authorization: Bearer <token>`` that verifies
        against it (the :api pipeline's token auth).
        ``api_tokens``: optional plans.tokens_api.ApiTokenRegistry — the
        reference's first-class ACCOUNT token resource
        (api_tokens/api_token.ex): enables /api/tokens CRUD (create/
        list/revoke, hashed storage), and tokens verify against the
        same bearer gate; list/delete are scoped to the ACCOUNT the
        authenticating token belongs to.
        ``replications``: optional plans.replication_api.ReplicationRegistry
        — enables /api/postgres_replications CRUD + /api/local_tunnels
        (router.ex:164-165). ``health_check``: optional callable returning
        (ok: bool, error: str | None) — backs GET /health
        (health_check_controller.ex; 200 {ok, rev} / 500 {ok, error});
        /api/info + /api/info/version (info_controller.ex) always serve
        ``version``. ``messages``: optional dict sink-name →
        plans.messages_api.MessageBrowser — enables message browse/peek
        routes GET /api/sinks/:name/messages[?limit&sort&state&visible&
        show_acked] and /api/sinks/:name/messages/:id (the console's
        SlotMessageStore.peek surface, show.ex:1191-1304, over the
        stubbed message_controller.ex REST shape).
        ``users``: optional plans.accounts_api.AccountsRegistry —
        enables /register, /login, /logout (user_session_controller.ex
        create/delete; the browser pipeline, so outside the api-key
        gate) plus session-token-authenticated GET /api/users/me and
        PATCH /api/users/password.
        ``tracer``: optional streaming.trace.Tracer — enables
        GET /api/sinks/:name/trace (the console trace tab,
        show.ex:160,273, over trace.ex rings). ``spark``: optional
        SparkSession — enables POST /api/functions/test (the function-
        editor test panel, functions/edit.ex:246-380, running code
        against submitted or synthetic messages). ``pull``: optional
        streaming.pull_api.PullRouter (or dict name → PullQueue) —
        mounts the sequin_stream receive/ack/nack routes on this API
        (router.ex:180-189 puts them in the same :api scope)."""
        self.registry = registry or ConfigRegistry()
        self.messages = messages
        self.users = users
        self.tracer = tracer
        self.spark = spark
        if pull is not None and not hasattr(pull, "handle"):
            from sequin_spark.streaming.pull_api import PullRouter

            pull = PullRouter(pull)
        self.pull = pull
        self.backfills = backfills
        if backfills is not None and self.registry.backfills is None:
            # one manager serves both surfaces: the REST backfill
            # routes AND the registry's initial_backfill creation
            # directive (a YAML apply through this server starts its
            # declared backfills, yaml_loader.ex initial_backfill)
            self.registry.backfills = backfills
        self.databases = databases
        self.endpoints = endpoints
        self.api_keys = api_keys
        self.api_tokens = api_tokens
        self.require_auth = require_auth
        self.replications = replications
        self.health_check = health_check
        self.version = version
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence
                pass

            def _json(self, code: int, payload: dict) -> bool:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                # truthy marker: the _resolve_* helpers return
                # (obj, self._json(404, ...)) and their callers branch on
                # `if err` — a None return made err ALWAYS falsy, so
                # handlers fell through with obj=None and crashed the
                # request thread AFTER the 404 was already on the wire
                # (seen as socketserver tracebacks in the r11 full-suite
                # run)
                return True

            def _blocked(self) -> bool:
                """Bearer-token gate (the :api pipeline's token auth) —
                active only when the server was built with
                require_auth=True and an ApiKeyRegistry."""
                if not outer.require_auth:
                    return False
                auth = self.headers.get("Authorization") or ""
                token = auth[7:] if auth.startswith("Bearer ") else None
                if outer.api_keys is not None and outer.api_keys.verify(token):
                    return False
                if outer.api_tokens is not None and \
                        outer.api_tokens.verify(token):
                    return False
                self._json(401, {"error": "unauthorized"})
                return True

            def _is_admin_key(self) -> bool:
                """True when the request authenticated with the admin
                api-key (single-tenant bootstrap auth) rather than an
                account-scoped ApiToken."""
                auth = self.headers.get("Authorization") or ""
                probe = auth[7:] if auth.startswith("Bearer ") else None
                return (outer.api_keys is not None
                        and outer.api_keys.verify(probe))

            def _token_account(self) -> str:
                """Account scope for /api/tokens: the account of the
                authenticating bearer token when it is an ApiToken
                (the reference's current_account), else 'default'
                (api-key or unauthenticated single-tenant mode)."""
                auth = self.headers.get("Authorization") or ""
                probe = auth[7:] if auth.startswith("Bearer ") else None
                if outer.api_tokens is not None:
                    t = outer.api_tokens.find_by_token(probe)
                    if t is not None:
                        return t.account_id
                return "default"

            def do_GET(self):  # noqa: N802
                from urllib.parse import parse_qsl, urlsplit

                u = urlsplit(self.path)
                # /health is outside the :api auth pipeline
                # (health_check_controller.ex check/2)
                if u.path == "/health":
                    ok, err = (outer.health_check() if outer.health_check
                               else (True, None))
                    if ok:
                        return self._json(200, {"ok": True,
                                                "rev": outer.version})
                    return self._json(500, {"ok": False, "error": err})
                # session-token user routes (browser pipeline — outside
                # the api-key gate; user_session flows)
                if u.path == "/api/users/me":
                    user, err = self._session_user()
                    if err:
                        return err
                    return self._json(200, user.to_external())
                if self._blocked():
                    return
                # pull-API receive over GET (router.ex:181)
                m = re.match(
                    r"^/api/(?:sequin_streams|http_pull_consumers)/"
                    r"([^/]+)/(receive|ack|nack)$", u.path)
                if m:
                    if outer.pull is None:
                        return self._json(
                            404, {"error": "pull consumers not enabled"})
                    params = dict(parse_qsl(u.query))
                    status, payload = outer.pull.handle(
                        m.group(1), m.group(2), params)
                    return self._json(status, payload)
                # info_controller.ex version/info (single-node: no peers)
                if u.path == "/api/info/version":
                    return self._json(200, {"version": outer.version})
                if u.path == "/api/info":
                    return self._json(200, {"version": outer.version,
                                            "nodes": []})
                # postgres_replications index/show (router.ex:164;
                # postgres_replication_json.ex index/show_with_info)
                if u.path == "/api/postgres_replications":
                    if outer.replications is None:
                        return self._json(404, {"error": "replications not enabled"})
                    return self._json(200, {
                        "data": [s.to_external() for s in outer.replications.list()]
                    })
                m = re.match(r"^/api/postgres_replications/([^/]+)$", u.path)
                if m:
                    slot, err = self._resolve_slot(m.group(1))
                    if err:
                        return err
                    return self._json(200, {
                        "postgres_replication": slot.to_external(),
                        "info": outer.replications.info_for(slot),
                    })
                # local_tunnels index (router.ex:165)
                if u.path == "/api/local_tunnels":
                    from sequin_spark.plans.replication_api import local_tunnels
                    return self._json(200, {
                        "data": local_tunnels(outer.endpoints, outer.databases)
                    })
                if u.path == "/api/config/export":
                    q = dict(parse_qsl(u.query))
                    show = str(q.get("show-sensitive", "")).lower() in ("true", "1")
                    return self._json(200, {"yaml": outer.registry.export(show)})
                # resource read API (router.ex:157-178 /api/sinks surface)
                if u.path == "/api/sinks":
                    with outer.registry._lock:
                        data = [to_external(s) for s in outer.registry.consumers.values()]
                    return self._json(200, {"data": data})
                # backfill index/show (backfill_controller.ex index/show)
                m = re.match(r"^/api/sinks/([^/]+)/backfills$", u.path)
                if m:
                    sink, err = self._sink_for_backfills(m.group(1))
                    if err:
                        return err
                    jobs = outer.backfills.list_for_sink(sink)
                    return self._json(200, {"data": [j.to_external() for j in jobs]})
                m = re.match(r"^/api/sinks/([^/]+)/backfills/([^/]+)$", u.path)
                if m:
                    sink, err = self._sink_for_backfills(m.group(1))
                    if err:
                        return err
                    job = outer.backfills.get(sink, m.group(2))
                    if job is None:
                        return self._json(404, {"error": f"no backfill {m.group(2)!r}"})
                    return self._json(200, job.to_external())
                # message browse/peek (show.ex:1191-1304 peek surface
                # over the stubbed message_controller.ex routes)
                m = re.match(r"^/api/sinks/([^/]+)/messages$", u.path)
                if m:
                    browser, err = self._browser_for(m.group(1))
                    if err:
                        return err
                    q = dict(parse_qsl(u.query))
                    try:
                        kwargs = {
                            "limit": int(q.get("limit", 100)),
                            "order": q.get("sort", "seq_asc"),
                            "state": q.get("state"),
                            "show_acked": q.get("show_acked", "true").lower()
                            != "false",
                        }
                        if "visible" in q:
                            if q["visible"].lower() not in ("true", "false"):
                                raise ValueError("Invalid visible parameter")
                            kwargs["visible"] = q["visible"].lower() == "true"
                        result = browser.list(**kwargs)
                    except ValueError as e:
                        return self._json(400, {"error": str(e)})
                    return self._json(200, result)
                # trace ring (show.ex :trace tab over trace.ex rings)
                m = re.match(r"^/api/sinks/([^/]+)/trace$", u.path)
                if m:
                    if outer.tracer is None:
                        return self._json(404, {"error": "tracing not enabled"})
                    if m.group(1) not in outer.registry.consumers:
                        return self._json(
                            404, {"error": f"no sink consumer {m.group(1)!r}"})
                    q = dict(parse_qsl(u.query))
                    status = q.get("status")
                    if status is not None and status not in (
                            "info", "warning", "error"):
                        return self._json(400, {"error": "Invalid status"})
                    try:
                        limit = int(q.get("limit", 50))
                    except ValueError:
                        return self._json(400, {"error": "Invalid limit"})
                    events = outer.tracer.events(
                        m.group(1), limit=limit, status=status)
                    return self._json(
                        200, {"data": [e.to_external() for e in events]})
                m = re.match(r"^/api/sinks/([^/]+)/messages/([^/]+)$", u.path)
                if m:
                    browser, err = self._browser_for(m.group(1))
                    if err:
                        return err
                    msg = browser.get(m.group(2))
                    if msg is None:
                        return self._json(404, {
                            "error": f"Message with ID {m.group(2)} not "
                                     "found. It may have been acknowledged "
                                     "or deleted."})
                    return self._json(200, msg)
                m = re.match(r"^/api/sinks/([^/]+)$", u.path)
                if m:
                    spec = outer.registry.consumers.get(m.group(1))
                    if spec is None:
                        return self._json(404, {"error": f"no sink consumer {m.group(1)!r}"})
                    return self._json(200, to_external(spec))
                # postgres_databases resource reads (router.ex:160,177-178)
                if u.path == "/api/postgres_databases":
                    if outer.databases is None:
                        return self._json(404, {"error": "databases not enabled"})
                    q = dict(parse_qsl(u.query))
                    show = str(q.get("show_sensitive", "")).lower() == "true"
                    return self._json(200, {
                        "data": [d.to_external(show) for d in outer.databases.list()]
                    })
                m = re.match(r"^/api/postgres_databases/([^/]+)(/schemas"
                             r"(?:/([^/]+)/tables)?)?$", u.path)
                if m:
                    db, err = self._resolve_db(m.group(1))
                    if err:
                        return err
                    if m.group(2) is None:  # show
                        q = dict(parse_qsl(u.query))
                        show = str(q.get("show_sensitive", "")).lower() == "true"
                        return self._json(200, db.to_external(show))
                    try:
                        tables = outer.databases.tables_for(db)
                    except Exception as e:  # noqa: BLE001 — introspection I/O
                        return self._json(422, {"error": str(e)[:300]})
                    if m.group(3) is None:  # schemas.json
                        return self._json(200, {
                            "schemas": sorted({t["schema"] for t in tables})
                        })
                    return self._json(200, {  # tables.json
                        "tables": [t for t in tables if t["schema"] == m.group(3)]
                    })
                # account-scoped token index (api_tokens.ex:42-44)
                if u.path == "/api/tokens":
                    if outer.api_tokens is None:
                        return self._json(404, {"error": "tokens not enabled"})
                    acct = self._token_account()
                    return self._json(200, {
                        "data": [t.to_external() for t in
                                 outer.api_tokens.list_tokens_for_account(acct)]
                    })
                # api_keys index (api_key_controller.ex:9-13)
                if u.path == "/api/api_keys":
                    if outer.api_keys is None:
                        return self._json(404, {"error": "api keys not enabled"})
                    return self._json(200, {
                        "data": [k.to_external() for k in outer.api_keys.list()]
                    })
                # http_endpoints resource reads (router.ex:168)
                if u.path == "/api/destinations/http_endpoints":
                    if outer.endpoints is None:
                        return self._json(404, {"error": "endpoints not enabled"})
                    q = dict(parse_qsl(u.query))
                    show = str(q.get("show_sensitive", "")).lower() == "true"
                    return self._json(200, {
                        "data": [e.to_external(show) for e in outer.endpoints.list()]
                    })
                m = re.match(r"^/api/destinations/http_endpoints/([^/]+)$", u.path)
                if m:
                    ep, err = self._resolve_endpoint(m.group(1))
                    if err:
                        return err
                    q = dict(parse_qsl(u.query))
                    show = str(q.get("show_sensitive", "")).lower() == "true"
                    return self._json(200, ep.to_external(show))
                self._json(404, {"error": "not found"})

            def _resolve_endpoint(self, id_or_name):
                if outer.endpoints is None:
                    return None, self._json(404, {"error": "endpoints not enabled"})
                ep = outer.endpoints.resolve(id_or_name)
                if ep is None:
                    return None, self._json(
                        404, {"error": f"no http endpoint {id_or_name!r}"}
                    )
                return ep, None

            def _resolve_db(self, id_or_name):
                """Resolve :id_or_name (get_db_for_account analog)."""
                if outer.databases is None:
                    return None, self._json(404, {"error": "databases not enabled"})
                db = outer.databases.resolve(id_or_name)
                if db is None:
                    return None, self._json(
                        404, {"error": f"no postgres database {id_or_name!r}"}
                    )
                return db, None

            def _resolve_slot(self, slot_id):
                if outer.replications is None:
                    return None, self._json(404, {"error": "replications not enabled"})
                slot = outer.replications.resolve(slot_id)
                if slot is None:
                    return None, self._json(
                        404, {"error": f"no postgres replication {slot_id!r}"}
                    )
                return slot, None

            def _session_token(self):
                auth = self.headers.get("Authorization") or ""
                return auth[7:] if auth.startswith("Bearer ") else None

            def _session_user(self):
                if outer.users is None:
                    return None, self._json(404, {"error": "accounts not enabled"})
                user = outer.users.get_user_by_session_token(
                    self._session_token())
                if user is None:
                    return None, self._json(401, {"error": "unauthorized"})
                return user, None

            def _browser_for(self, name):
                if outer.messages is None:
                    return None, self._json(
                        404, {"error": "message browsing not enabled"})
                browser = outer.messages.get(name)
                if browser is None:
                    return None, self._json(
                        404, {"error": f"no sink consumer {name!r}"})
                return browser, None

            def _sink_for_backfills(self, name):
                """Resolve the :sink_id_or_name segment; 404s mirror
                find_sink_consumer failures (backfill_controller.ex:17-23)."""
                if outer.backfills is None:
                    return None, self._json(404, {"error": "backfills not enabled"})
                if name not in outer.registry.consumers:
                    return None, self._json(404, {"error": f"no sink consumer {name!r}"})
                return name, None

            def _read_json_body(self):
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n).decode() if n else "{}"
                try:
                    body = json.loads(raw or "{}")
                except json.JSONDecodeError:
                    return None
                return body if isinstance(body, dict) else None

            def do_PATCH(self):  # noqa: N802 — backfill/database/endpoint updates
                # password update (accounts.ex:307: revokes all sessions)
                if self.path.split("?")[0] == "/api/users/password":
                    user, err = self._session_user()
                    if err:
                        return err
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    try:
                        outer.users.update_user_password(
                            user, body.get("current_password"),
                            body.get("password"))
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(200, {"success": True})
                if self._blocked():
                    return
                m = re.match(r"^/api/destinations/http_endpoints/([^/]+)$",
                             self.path.split("?")[0])
                if m:
                    ep, err = self._resolve_endpoint(m.group(1))
                    if err:
                        return err
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    try:
                        ep = outer.endpoints.update(ep.id, body)
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(200, ep.to_external())
                m = re.match(r"^/api/postgres_databases/([^/]+)$",
                             self.path.split("?")[0])
                if m:
                    db, err = self._resolve_db(m.group(1))
                    if err:
                        return err
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    try:
                        db = outer.databases.update(db.id, body)
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(200, db.to_external())
                # postgres_replications update (controller update/2;
                # postgres_database_id immutable)
                m = re.match(r"^/api/postgres_replications/([^/]+)$",
                             self.path.split("?")[0])
                if m:
                    if outer.replications is None:
                        return self._json(404, {"error": "replications not enabled"})
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    body.pop("id", None)
                    try:
                        slot = outer.replications.update(m.group(1), body)
                    except KeyError:
                        return self._json(
                            404, {"error": f"no postgres replication {m.group(1)!r}"})
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(200, slot.to_external())
                # sinks update (sink_consumer_controller.ex:46-57)
                m = re.match(r"^/api/sinks/([^/]+)$", self.path.split("?")[0])
                if m:
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    body.pop("id_or_name", None)
                    try:
                        spec = outer.registry.update_consumer(m.group(1), body)
                    except KeyError:
                        return self._json(
                            404, {"error": f"no sink consumer {m.group(1)!r}"})
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(200, to_external(spec))
                m = re.match(r"^/api/sinks/([^/]+)/backfills/([^/]+)$",
                             self.path.split("?")[0])
                if not m:
                    return self._json(404, {"error": "not found"})
                sink, err = self._sink_for_backfills(m.group(1))
                if err:
                    return err
                body = self._read_json_body()
                if body is None:
                    return self._json(400, {"error": "invalid JSON body"})
                try:
                    job = outer.backfills.update(sink, m.group(2), body)
                except KeyError:
                    return self._json(404, {"error": f"no backfill {m.group(2)!r}"})
                except ValueError as e:
                    return self._json(422, {"error": str(e)})
                self._json(200, job.to_external())

            do_PUT = do_PATCH  # noqa: N815 — resources(...) accepts both

            def do_DELETE(self):  # noqa: N802 — database/endpoint/key deletes
                # logout (user_session_controller.ex delete → log_out_user)
                if self.path.split("?")[0] == "/logout":
                    if outer.users is None:
                        return self._json(404, {"error": "accounts not enabled"})
                    outer.users.delete_session_token(self._session_token())
                    return self._json(200, {"success": True})
                if self._blocked():
                    return
                # account-scoped token revoke (api_tokens.ex:56-63:
                # another account's token is not-found, not forbidden)
                m = re.match(r"^/api/tokens/([^/]+)$",
                             self.path.split("?")[0])
                if m:
                    if outer.api_tokens is None:
                        return self._json(404, {"error": "tokens not enabled"})
                    acct = self._token_account()
                    if not outer.api_tokens.delete_token_for_account(
                            acct, m.group(1)):
                        return self._json(404, {"error": "no such token"})
                    return self._json(200, {"success": True})
                # api_keys delete (api_key_controller.ex:23-29)
                m = re.match(r"^/api/api_keys/([^/]+)$", self.path.split("?")[0])
                if m:
                    if outer.api_keys is None:
                        return self._json(404, {"error": "api keys not enabled"})
                    if not outer.api_keys.delete(m.group(1)):
                        return self._json(404, {"error": "no such api key"})
                    return self._json(200, {"success": True})
                m = re.match(r"^/api/destinations/http_endpoints/([^/]+)$",
                             self.path.split("?")[0])
                if m:
                    ep, err = self._resolve_endpoint(m.group(1))
                    if err:
                        return err
                    # http_endpoint_json.ex:19-21 delete shape
                    return self._json(
                        200, {"id": outer.endpoints.delete(ep.id), "deleted": True}
                    )
                # postgres_replications delete → {id, deleted: true}
                m = re.match(r"^/api/postgres_replications/([^/]+)$",
                             self.path.split("?")[0])
                if m:
                    if outer.replications is None:
                        return self._json(404, {"error": "replications not enabled"})
                    try:
                        slot_id = outer.replications.delete(m.group(1))
                    except KeyError:
                        return self._json(
                            404, {"error": f"no postgres replication {m.group(1)!r}"})
                    return self._json(200, {"id": slot_id, "deleted": True})
                # sinks delete (sink_consumer_controller.ex:60-67;
                # sink_consumer_json.ex delete → {id, deleted: true})
                m = re.match(r"^/api/sinks/([^/]+)$", self.path.split("?")[0])
                if m:
                    try:
                        name = outer.registry.delete_consumer(m.group(1))
                    except KeyError:
                        return self._json(
                            404, {"error": f"no sink consumer {m.group(1)!r}"})
                    return self._json(200, {"id": name, "deleted": True})
                m = re.match(r"^/api/postgres_databases/([^/]+)$",
                             self.path.split("?")[0])
                if not m:
                    return self._json(404, {"error": "not found"})
                db, err = self._resolve_db(m.group(1))
                if err:
                    return err
                # delete.json shape (postgres_database_json.ex:15-17)
                self._json(200, {"success": True, "id": outer.databases.delete(db.id)})

            def do_POST(self):  # noqa: N802
                # login/register (user_session_controller.ex create;
                # UserRegistrationLive / self-hosted SetupLive) — the
                # browser pipeline, outside the api-key gate
                if self.path.split("?")[0] in ("/login", "/register"):
                    if outer.users is None:
                        return self._json(404, {"error": "accounts not enabled"})
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    # accept both flat and the controller's nested
                    # {"user": {...}} param shape
                    params = body.get("user", body)
                    if self.path.split("?")[0] == "/register":
                        try:
                            user = outer.users.register_user(
                                params.get("email"), params.get("password"),
                                name=params.get("name"))
                        except ValueError as e:
                            return self._json(422, {"error": str(e)})
                        return self._json(201, user.to_external())
                    result = outer.users.login(
                        params.get("email"), params.get("password"))
                    if result is None:
                        # never disclose whether the email exists
                        return self._json(
                            401, {"error": "Invalid email or password"})
                    user, token = result
                    return self._json(200, {"token": token,
                                            "user": user.to_external()})
                if self._blocked():
                    return
                # token create (ApiTokens.create_for_account):
                # secret generated server-side unless supplied; rendered
                # exactly once, in this response
                if self.path.split("?")[0] == "/api/tokens":
                    if outer.api_tokens is None:
                        return self._json(404, {"error": "tokens not enabled"})
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    # account scope comes from the AUTHENTICATING
                    # token, never the body (api_key_controller.ex
                    # always uses conn.assigns.account_id): a
                    # client-supplied account_id that differs is a
                    # cross-account escalation unless the caller is
                    # the admin api-key (single-tenant bootstrap).
                    acct = self._token_account()
                    want = body.get("account_id")
                    if want and want != acct:
                        if not self._is_admin_key():
                            return self._json(403, {
                                "error": "account_id does not match "
                                         "the authenticated account"})
                        acct = want
                    try:
                        tok = outer.api_tokens.create_for_account(
                            acct, body.get("name"), token=body.get("token"))
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(201, tok.to_created())
                # api_keys create (api_key_controller.ex:15-21)
                if self.path.split("?")[0] == "/api/api_keys":
                    if outer.api_keys is None:
                        return self._json(404, {"error": "api keys not enabled"})
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    try:
                        key = outer.api_keys.create(body.get("name"))
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(201, key.to_external())
                # http_endpoints create (router.ex:168)
                if self.path.split("?")[0] == "/api/destinations/http_endpoints":
                    if outer.endpoints is None:
                        return self._json(404, {"error": "endpoints not enabled"})
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    try:
                        ep = outer.endpoints.create(body)
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(201, ep.to_external())
                # pull-API receive/ack/nack over POST (router.ex:180-189)
                m = re.match(
                    r"^/api/(?:sequin_streams|http_pull_consumers)/"
                    r"([^/]+)/(receive|ack|nack)$", self.path.split("?")[0])
                if m:
                    if outer.pull is None:
                        return self._json(
                            404, {"error": "pull consumers not enabled"})
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    status, payload = outer.pull.handle(
                        m.group(1), m.group(2), body)
                    return self._json(status, payload)
                # function tester (functions/edit.ex test panel)
                if self.path.split("?")[0] == "/api/functions/test":
                    if outer.spark is None:
                        return self._json(
                            404, {"error": "function testing not enabled"})
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    from sequin_spark.functions.tester import run_function

                    ftype = body.get("type", "transform")
                    code = body.get("code") or ""
                    msgs = body.get("messages")
                    if msgs is not None and not isinstance(msgs, list):
                        return self._json(
                            400, {"error": "messages must be a list"})
                    results = run_function(outer.spark, ftype, code, msgs)
                    if len(results) == 1 and "error" in results[0]:
                        return self._json(422, results[0])
                    return self._json(200, {"results": results})
                # postgres_replications create (controller create/2)
                if self.path.split("?")[0] == "/api/postgres_replications":
                    if outer.replications is None:
                        return self._json(404, {"error": "replications not enabled"})
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    try:
                        slot = outer.replications.create(body)
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(200, slot.to_external())
                # sinks create (sink_consumer_controller.ex:34-44:
                # from_external → validate → create, rendered to_external)
                if self.path.split("?")[0] == "/api/sinks":
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    try:
                        spec = outer.registry.create_consumer(body)
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(200, to_external(spec))
                # postgres_databases create + member actions
                # (postgres_database_controller.ex create/test_connection/
                # refresh_tables; router.ex:160,175-176)
                m = re.match(
                    r"^/api/postgres_databases(?:/([^/]+)"
                    r"(?:/(test_connection|refresh_tables))?)?$",
                    self.path.split("?")[0],
                )
                if m:
                    if outer.databases is None:
                        return self._json(404, {"error": "databases not enabled"})
                    if m.group(1) is None:  # create
                        body = self._read_json_body()
                        if body is None:
                            return self._json(400, {"error": "invalid JSON body"})
                        try:
                            db = outer.databases.create(body)
                        except ValueError as e:
                            return self._json(422, {"error": str(e)})
                        return self._json(201, db.to_external())
                    db, err = self._resolve_db(m.group(1))
                    if err:
                        return err
                    if m.group(2) == "test_connection":
                        ok, reason = outer.databases.test_connection(db)
                        if ok:
                            return self._json(200, {"success": True})
                        return self._json(422, {"success": False, "reason": reason})
                    if m.group(2) == "refresh_tables":
                        try:
                            outer.databases.refresh_tables(db)
                        except Exception as e:  # noqa: BLE001 — introspection I/O
                            return self._json(422, {"success": False,
                                                    "error": str(e)[:300]})
                        return self._json(200, {"success": True})
                    return self._json(404, {"error": "not found"})
                # backfill create (backfill_controller.ex:34-53): body is
                # {"table": "schema.table"} plus optional "state"; unknown
                # fields rejected (from_external_backfill parity)
                m = re.match(r"^/api/sinks/([^/]+)/backfills$",
                             self.path.split("?")[0])
                if m:
                    sink, err = self._sink_for_backfills(m.group(1))
                    if err:
                        return err
                    body = self._read_json_body()
                    if body is None:
                        return self._json(400, {"error": "invalid JSON body"})
                    table_ref = body.pop("table", None)
                    state = body.pop("state", None)
                    if body:
                        return self._json(
                            422, {"error": f"Unknown field: {sorted(body)[0]}"}
                        )
                    try:
                        job = outer.backfills.create(sink, table_ref)
                        if state is not None and state != "active":
                            job.transition(state)
                    except ValueError as e:
                        return self._json(422, {"error": str(e)})
                    return self._json(200, job.to_external())
                action = {"/api/config/plan": "plan", "/api/config/apply": "apply"}.get(
                    self.path.split("?")[0]
                )
                if action is None:
                    return self._json(404, {"error": "not found"})
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n).decode() if n else ""
                # body is the YAML document itself (apply_from_yml), or
                # a JSON {"yaml": ...} wrapper
                if (self.headers.get("Content-Type") or "").startswith("application/json"):
                    try:
                        raw = json.loads(raw or "{}").get("yaml", "")
                    except json.JSONDecodeError:
                        return self._json(400, {"error": "invalid JSON body"})
                try:
                    functions, specs = load_config(raw)
                except Exception as e:  # noqa: BLE001 — bad YAML/spec shape
                    return self._json(400, {"error": f"invalid config: {e}"})
                result = getattr(outer.registry, action)(specs, functions)
                if result.get("errors"):
                    return self._json(422, result)
                self._json(200, result)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self) -> "ConfigApiServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def url(self, action: str) -> str:
        return f"http://127.0.0.1:{self.port}/api/config/{action}"
