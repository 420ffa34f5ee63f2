/* Chat SPA. Functional parity with the reference web/main.js + chat.js:
   thread sidebar (localStorage sessions + server threads), SSE chat with a
   collapsible reasoning block, params panel, snippet search with selection
   -> context injection / snippets-only mode, stop button, export, save
   answer to KB (with local download fallback), ?threadId= loading. */

let params = Params.load();
let api = new ApiClient(params);
let currentSession = null;
let activeController = null;
let selectedSnippets = [];

const $ = (id) => document.getElementById(id);

/* ---------------- params panel binding ---------------- */
const PARAM_FIELDS = ["apiBase", "apiKey", "mode", "language", "engine",
  "targetLength", "threadId", "k", "rerank", "debug", "namespace",
  "canonicality", "tone", "directness", "empathy", "hedging", "formality"];

function bindParams() {
  for (const f of PARAM_FIELDS) {
    const node = $(f);
    if (!node) continue;
    if (node.type === "checkbox") node.checked = !!params[f];
    else node.value = params[f] ?? "";
    node.addEventListener("change", () => {
      params[f] = node.type === "checkbox" ? node.checked :
        (node.type === "number" ? Number(node.value) : node.value);
      Params.save(params);
      api = new ApiClient(params);
    });
  }
}

/* ---------------- sessions / threads ---------------- */
function newSession() {
  const id = "local-" + Date.now();
  currentSession = { id, title: "", messages: [], serverThreadId: "" };
  Sessions.put(currentSession);
  renderThreadList();
  renderMessages();
}

function openSession(id) {
  currentSession = Sessions.get(id);
  renderThreadList();
  renderMessages();
}

async function loadServerThread(threadId) {
  try {
    const data = await api.get(`/threads/${encodeURIComponent(threadId)}/messages`);
    currentSession = {
      id: "srv-" + threadId, title: threadId, serverThreadId: threadId,
      messages: data.messages.map((m) => ({ role: m.role, text: m.content })),
    };
    Sessions.put(currentSession);
    renderThreadList();
    renderMessages();
  } catch (e) { alert("load thread failed: " + e.message); }
}

function renderThreadList() {
  const list = $("threadList");
  list.innerHTML = "";
  const all = Sessions.load();
  for (const s of Object.values(all).sort((a, b) => (b.id > a.id ? 1 : -1))) {
    const title = s.title || (s.messages[0] && s.messages[0].text.slice(0, 24)) || "(空)";
    const row = el("div", { class: "thread" + (currentSession && s.id === currentSession.id ? " active" : "") },
      el("span", { class: "thread-title", onclick: () => openSession(s.id) }, title),
      el("button", { class: "thread-del", onclick: () => { Sessions.remove(s.id); if (currentSession?.id === s.id) newSession(); renderThreadList(); } }, "×"));
    list.append(row);
  }
}

async function refreshServerThreads() {
  try {
    const data = await api.get("/threads");
    const list = $("threadList");
    const head = el("div", { class: "thread-sep" }, "— server threads —");
    list.append(head);
    for (const t of data.threads) {
      list.append(el("div", { class: "thread" },
        el("span", { class: "thread-title", onclick: () => loadServerThread(t.thread_id) },
          `☁ ${t.thread_id} (${t.count})`)));
    }
  } catch (e) { alert("threads failed: " + e.message); }
}

/* ---------------- messages rendering ---------------- */
function renderMessages() {
  const box = $("messages");
  box.innerHTML = "";
  for (const m of currentSession.messages) box.append(renderBubble(m));
  box.scrollTop = box.scrollHeight;
}

function renderBubble(m) {
  const wrap = el("div", { class: "bubble " + (m.role === "user" ? "user" : "assistant") });
  if (m.reasoning) {
    const details = el("details", { class: "reasoning" },
      el("summary", {}, "推理過程"),
      el("pre", {}, m.reasoning));
    wrap.append(details);
  }
  if (m.debug) {
    const dbg = el("details", { class: "debug-preview" },
      el("summary", {}, "提示詞預覽 (debug)"),
      el("pre", {}, typeof m.debug === "string" ? m.debug : JSON.stringify(m.debug, null, 2)));
    wrap.append(dbg);
  }
  wrap.append(el("div", { class: "bubble-text" }, m.text || ""));
  if (m.citations && m.citations.length) {
    const cits = el("div", { class: "citations" },
      ...m.citations.slice(0, 6).map((c) =>
        el("span", { class: "cit", title: (c.text || "").slice(0, 300) }, String(c.id || "?"))));
    wrap.append(cits);
  }
  if (m.pending) wrap.append(el("div", { class: "loader" }, "…"));
  return wrap;
}

/* ---------------- sending ---------------- */
function styleSpec() {
  if (!params.tone) return null;
  return { tone: params.tone, directness: +params.directness,
           empathy: +params.empathy, hedging: +params.hedging,
           formality: +params.formality };
}

async function send() {
  const q = $("queryInput").value.trim();
  if (!q || activeController) return;
  $("queryInput").value = "";
  const userMsg = { role: "user", text: q };
  const botMsg = { role: "assistant", text: "", reasoning: "", citations: [], pending: true };
  currentSession.messages.push(userMsg, botMsg);
  if (!currentSession.title) currentSession.title = q.slice(0, 24);
  renderMessages();

  const body = {
    query: q, mode: params.mode, k: +params.k || 6,
    namespace: params.namespace || null, canonicality: params.canonicality || null,
    rerank: !!params.rerank, engine: params.engine || null,
    language: params.language, target_length: params.targetLength || null,
    thread_id: currentSession.serverThreadId || params.threadId || null,
    style: styleSpec(),
    debug: !!params.debug,
  };
  if (selectedSnippets.length) {
    if ($("snippetsOnly").checked) {
      // restrict retrieval to the selected snippets (server-side filter)
      body.selected_ids = selectedSnippets.map((s) => s.id);
    } else {
      // inject the selected snippet text as extra context alongside
      // server retrieval (reference main.js:340-352 client-side injection)
      body.extra_context = selectedSnippets
        .map((s) => `[${s.id}] ${s.text || ""}`).join("\n\n");
    }
  }

  $("stopBtn").disabled = false;
  activeController = api.composeStream(body, (evt) => {
    if (evt.type === "reasoning") botMsg.reasoning += evt.data;
    else if (evt.type === "text") botMsg.text += evt.data;
    else if (evt.debug) botMsg.debug = evt.debug;  // server prompt preview (reference main.js:337)
    else if (evt.citations) {
      botMsg.citations = evt.citations;
      if (evt.thread_id) currentSession.serverThreadId = evt.thread_id;
    }
    renderMessages();
  }, () => {
    botMsg.pending = false;
    activeController = null;
    $("stopBtn").disabled = true;
    Sessions.put(currentSession);
    renderMessages();
  }, (e) => {
    botMsg.pending = false;
    botMsg.text += `\n[error] ${e.message}`;
    activeController = null;
    $("stopBtn").disabled = true;
    renderMessages();
  });
}

/* ---------------- snippets ---------------- */
async function snippetSearch() {
  const q = $("snippetQuery").value.trim();
  if (!q) return;
  const box = $("snippetResults");
  box.innerHTML = "搜尋中…";
  let hits = [];
  try {
    const out = await api.post("/search", { query: q, k: +params.k || 6,
      namespace: params.namespace || null, rerank: !!params.rerank, highlight: true });
    hits = out.hits || [];
  } catch (e) {
    try {  // fallback to keyword-only search (reference main.js:359-378)
      const out = await api.post("/kb/search", { query: q, k: +params.k || 6 });
      hits = out.hits || [];
    } catch (e2) { box.innerHTML = "搜尋失敗: " + e2.message; return; }
  }
  box.innerHTML = "";
  for (const h of hits) {
    const selected = () => selectedSnippets.some((s) => s.id === h.id);
    const rowBtn = el("button", {
      class: "snip-toggle", onclick: (ev) => {
        if (selected()) selectedSnippets = selectedSnippets.filter((s) => s.id !== h.id);
        else selectedSnippets.push({ id: h.id, text: h.text });
        ev.target.textContent = selected() ? "✓" : "＋";
      },
    }, selected() ? "✓" : "＋");
    box.append(el("div", { class: "snip" }, rowBtn,
      el("span", { class: "snip-text", title: h.text || "" },
        `${(h.metadata && h.metadata.title) || h.id}: ${(h.text || "").slice(0, 80)}`)));
  }
}

/* ---------------- export / save ---------------- */
function exportChat() {
  const blob = new Blob([JSON.stringify(currentSession, null, 2)], { type: "application/json" });
  const a = el("a", { href: URL.createObjectURL(blob), download: `chat-${currentSession.id}.json` });
  a.click();
}

async function saveAnswerToKB() {
  const last = [...currentSession.messages].reverse().find((m) => m.role === "assistant" && m.text);
  if (!last) return alert("沒有可儲存的回答");
  const title = prompt("文件標題：", currentSession.title || "chat-answer");
  if (!title) return;
  try {
    const out = await api.post("/docs/save", { title, content: last.text,
      metadata: { namespace: "history", canonicality: "non" } });
    alert("已存入 KB: " + out.id);
  } catch (e) {
    // local download fallback (reference main.js:417-423)
    const blob = new Blob([last.text], { type: "text/plain" });
    const a = el("a", { href: URL.createObjectURL(blob), download: `${title}.txt` });
    a.click();
    alert("伺服器儲存失敗，已改為本機下載：" + e.message);
  }
}

/* ---------------- init ---------------- */
bindParams();
$("newChatBtn").onclick = newSession;
$("refreshThreadsBtn").onclick = refreshServerThreads;
$("sendBtn").onclick = send;
$("stopBtn").onclick = () => activeController && activeController.abort();
$("exportBtn").onclick = exportChat;
$("saveDocBtn").onclick = saveAnswerToKB;
$("snippetSearchBtn").onclick = snippetSearch;
$("queryInput").addEventListener("keydown", (e) => {
  if (e.key === "Enter" && (e.ctrlKey || e.metaKey)) send();
});
$("pingBtn").onclick = async () => {
  const out = $("pingResult");
  try {
    const h = await api.get("/health");
    out.textContent = `ok (docs: ${h.docs_count}, ${h.device?.backend || "?"})`;
  } catch (e) { out.textContent = "failed: " + e.message; }
};

const urlThread = new URLSearchParams(location.search).get("threadId");
if (urlThread) loadServerThread(urlThread);
else newSession();
