"""Form-driven playground UI over the HTTP facade — the engine's
counterpart of the reference's Jinja playground
(``app/playground.py:316-521`` + ``app/templates/playground.html``),
reduced to a stdlib form: one page that renders connector/resource/
cursor/filter/mapping inputs and, on submit, runs the SAME
``ep_run_pull`` / ``ep_run_push`` implementations the JSON API uses,
then shows the result summary (cursor + row count) or the error.

No template engine, no JS: plain HTML built from the registry state
(connectors via ``list_connectors``, auth descriptors via
``export_auth_fields``) and parsed back with ``urllib.parse.parse_qs``.
The playground adds ZERO query capability — it is a thin presentation
shim, kept deliberately small.
"""

from __future__ import annotations

import html
import json
from typing import Any, Mapping

MAX_MAPPING_ROWS = 4
MAX_FILTER_ROWS = 4

_OPS = ("eq", "neq", "gt", "gte", "lt", "lte", "in", "contains")


def _esc(v: Any) -> str:
    return html.escape(str(v if v is not None else ""), quote=True)


def _select(name: str, options, selected: str | None) -> str:
    rows = "".join(
        f'<option value="{_esc(o)}"{" selected" if o == selected else ""}>{_esc(o)}</option>'
        for o in options
    )
    return f'<select name="{_esc(name)}">{rows}</select>'


def parse_body(form: Mapping[str, list[str]]) -> dict:
    """Playground form fields → the JSON body ``ep_run_pull`` /
    ``ep_run_push`` accept (same field names as the API docs)."""

    def get(name: str, default: str = "") -> str:
        return (form.get(name) or [default])[-1].strip()

    body: dict[str, Any] = {
        "operation": get("operation", "pull"),
        "resource": get("resource", "job"),
        "origin": get("origin"),
        "dry_run": get("dry_run") in ("on", "true", "1"),
    }
    if get("target"):
        body["target"] = get("target")
    if get("uid_col"):
        body["uid_col"] = get("uid_col")
    if get("cursor_col"):
        body["cursor_col"] = get("cursor_col")
    cursor: dict[str, Any] = {"mode": get("cursor_mode", "updated_at")}
    if get("cursor_start"):
        cursor["start"] = get("cursor_start")
    if get("cursor_end"):
        cursor["end"] = get("cursor_end")
    cursor["sort_by"] = get("cursor_sort_by", "asc")
    body["cursor"] = cursor

    where = []
    for i in range(MAX_FILTER_ROWS):
        f, op, v = get(f"filter_field_{i}"), get(f"filter_op_{i}"), get(f"filter_value_{i}")
        if f and op:
            value: Any = v
            if op == "in":
                value = [s.strip() for s in v.split(",") if s.strip()]
            where.append({"field": f, "op": op, "value": value})
    if where:
        key = "where" if body["operation"] == "pull" else "having"
        body[key] = where

    mapping = []
    for i in range(MAX_MAPPING_ROWS):
        src, dst = get(f"mapping_from_{i}"), get(f"mapping_to_{i}")
        if src and dst:
            mapping.append({"from": src, "to": dst})
    if mapping:
        body["mapping"] = mapping
    return body


def render(
    connectors: list[str],
    *,
    state: Mapping[str, list[str]] | None = None,
    result: dict | None = None,
    error: str | None = None,
    auth_fields: Mapping[str, list] | None = None,
    csrf_token: str | None = None,
) -> str:
    """The full playground page. ``state`` re-fills the form after a
    POST; ``result``/``error`` render the outcome panel; ``auth_fields``
    maps connector name → auth descriptors (shown so a user knows what
    credentials that connector's backend expects). ``csrf_token`` (a
    per-app-instance random value) is embedded as a hidden field and
    verified on POST — a cross-site form post can't know it, so a
    browser pointed at the locally-bound app can't be tricked into
    running a pull/push."""
    state = state or {}

    def val(name: str, default: str = "") -> str:
        return _esc((state.get(name) or [default])[-1] if state else default)

    sel = (state.get("origin") or [connectors[0] if connectors else ""])[-1]
    tgt = (state.get("target") or [""])[-1]

    filter_rows = "".join(
        f"<tr><td><input name='filter_field_{i}' value='{val(f'filter_field_{i}')}'></td>"
        f"<td>{_select(f'filter_op_{i}', ('',) + _OPS, (state.get(f'filter_op_{i}') or [''])[-1])}</td>"
        f"<td><input name='filter_value_{i}' value='{val(f'filter_value_{i}')}'></td></tr>"
        for i in range(MAX_FILTER_ROWS)
    )
    mapping_rows = "".join(
        f"<tr><td><input name='mapping_from_{i}' value='{val(f'mapping_from_{i}')}'></td>"
        f"<td><input name='mapping_to_{i}' value='{val(f'mapping_to_{i}')}'></td></tr>"
        for i in range(MAX_MAPPING_ROWS)
    )
    auth_html = ""
    for cname, fields in (auth_fields or {}).items():
        if not fields:
            continue
        rows = ""
        for fld in fields:
            suffix = (
                " (required)"
                if fld["required"]
                else f" (default {_esc(fld['default'])})"
            )
            rows += f"<li><code>{_esc(fld['name'])}</code>: {_esc(fld['type'])}{suffix}</li>"
        auth_html += f"<p><b>{_esc(cname)}</b> auth fields:</p><ul>{rows}</ul>"

    outcome = ""
    if error is not None:
        outcome = f"<div class='err'><b>Error:</b> {_esc(error)}</div>"
    elif result is not None:
        outcome = (
            "<div class='ok'><b>Result</b><pre>"
            + _esc(json.dumps(result, indent=2, default=str))
            + "</pre></div>"
        )

    return f"""<!doctype html>
<html><head><title>hrtech-etl-spark playground</title><style>
body {{ font-family: sans-serif; margin: 2em; max-width: 60em; }}
table {{ border-collapse: collapse; }} td {{ padding: 2px 6px; }}
fieldset {{ margin-bottom: 1em; }} .err {{ color: #a00; }}
.ok pre {{ background: #f4f4f4; padding: 1em; }}
</style></head><body>
<h1>hrtech-etl-spark playground</h1>
{outcome}
<form method="post" action="/playground">
{f'<input type="hidden" name="csrf_token" value="{_esc(csrf_token)}">' if csrf_token else ''}
<fieldset><legend>Operation</legend>
  {_select('operation', ('pull', 'push'), (state.get('operation') or ['pull'])[-1])}
  resource {_select('resource', ('job', 'profile'), (state.get('resource') or ['job'])[-1])}
  <label><input type="checkbox" name="dry_run"
    {"checked" if (state.get('dry_run') or [''])[-1] in ('on', 'true', '1') else ""}> dry run</label>
</fieldset>
<fieldset><legend>Connectors</legend>
  origin {_select('origin', connectors, sel)}
  target {_select('target', [''] + list(connectors), tgt)}
  uid column <input name="uid_col" value="{val('uid_col', 'uid')}">
</fieldset>
<fieldset><legend>Cursor (pull)</legend>
  mode {_select('cursor_mode', ('updated_at', 'created_at'), (state.get('cursor_mode') or ['updated_at'])[-1])}
  start <input name="cursor_start" value="{val('cursor_start')}" placeholder="2024-01-01 00:00:00">
  end <input name="cursor_end" value="{val('cursor_end')}">
  sort {_select('cursor_sort_by', ('asc', 'desc'), (state.get('cursor_sort_by') or ['asc'])[-1])}
  cursor column <input name="cursor_col" value="{val('cursor_col')}">
</fieldset>
<fieldset><legend>Filters (pull: WHERE / push: HAVING)</legend>
  <table><tr><th>field</th><th>op</th><th>value</th></tr>{filter_rows}</table>
</fieldset>
<fieldset><legend>Mapping (native → unified)</legend>
  <table><tr><th>from</th><th>to</th></tr>{mapping_rows}</table>
</fieldset>
<button type="submit" name="action" value="run">Run</button>
</form>
{auth_html}
</body></html>"""
