"""Static consistency checks for the web UI (no browser in this image, so
at least guarantee the JS and HTML agree on asset paths and element ids)."""

import re
from pathlib import Path

WEB = Path(__file__).resolve().parents[1] / "web"


def test_referenced_assets_exist():
    for page in ("index.html", "kb.html"):
        html = (WEB / page).read_text(encoding="utf-8")
        for ref in re.findall(r'(?:src|href)="([^"#]+)"', html):
            if ref.startswith(("http", "//")):
                continue
            assert (WEB / ref).is_file(), f"{page} references missing {ref}"


def _ids_in(html: str) -> set:
    return set(re.findall(r'id="([^"]+)"', html))


def _ids_used(js: str) -> set:
    return set(re.findall(r'\$\("([^"]+)"\)', js)) | set(
        re.findall(r'getElementById\("([^"]+)"\)', js))


def test_app_js_element_ids_exist():
    html_ids = _ids_in((WEB / "index.html").read_text(encoding="utf-8"))
    used = _ids_used((WEB / "app.js").read_text(encoding="utf-8"))
    missing = used - html_ids
    assert not missing, f"app.js uses ids missing from index.html: {missing}"


def test_kb_js_element_ids_exist():
    html_ids = _ids_in((WEB / "kb.html").read_text(encoding="utf-8"))
    used = _ids_used((WEB / "kb.js").read_text(encoding="utf-8"))
    missing = used - html_ids
    assert not missing, f"kb.js uses ids missing from kb.html: {missing}"


def test_shared_js_loaded_before_dependents():
    for page, dependent in (("index.html", "app.js"), ("kb.html", "kb.js")):
        html = (WEB / page).read_text(encoding="utf-8")
        assert html.index('src="shared.js"') < html.index(f'src="{dependent}"')


def test_api_paths_in_js_exist_as_routes():
    """Every API path the UI fetches is a registered route."""
    from tpu_rag.api.app import create_app
    from tpu_rag.config import Config
    from tpu_rag.engine import RagEngine
    from tests.test_api import FakeEncoder, ScriptedBackend, ScriptedDispatcher
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cfg = Config(persist_dir=f"{td}/vs", kb_db_path=f"{td}/kb.sqlite3",
                     db_path=f"{td}/app.sqlite3", docs_dir=f"{td}/docs",
                     index_dtype="float32", use_pallas=False)
        engine = RagEngine(cfg, encoder=FakeEncoder(),
                           dispatcher=ScriptedDispatcher(ScriptedBackend()))
        app = create_app(engine=engine)
    route_prefixes = {"/" + (r.segments[0] if r.segments else "") for r in app.routes}

    js = "".join((WEB / f).read_text(encoding="utf-8")
                 for f in ("shared.js", "app.js", "kb.js"))
    for path in set(re.findall(r'"(/(?:search|compose\w*|docs|kb|threads|health|metrics|config)[^"]*)"', js)):
        prefix = "/" + path.lstrip("/").split("/")[0]
        assert prefix in route_prefixes, f"UI fetches unregistered path {path}"
