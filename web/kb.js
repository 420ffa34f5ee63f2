/* KB manager. Parity with reference web/kb.js: upload file as doc, list +
   search docs, folder tree grouped by path, delete, modal editor with a
   recursive JSON tree editor for nested metadata/body values, PUT save. */

let params = Params.load();
let api = new ApiClient(params);
let editingDoc = null;

const $ = (id) => document.getElementById(id);

/* ---------------- listing / tree ---------------- */
async function refresh() {
  const tree = $("kbTree");
  tree.innerHTML = "載入中…";
  try {
    const data = await api.get("/docs/list");
    renderTree(data.docs || []);
  } catch (e) { tree.innerHTML = "載入失敗: " + e.message; }
}

function renderTree(docs) {
  const tree = $("kbTree");
  tree.innerHTML = "";
  const folders = {};
  for (const d of docs) (folders[d.folder || "."] ||= []).push(d);
  for (const [folder, items] of Object.entries(folders).sort()) {
    const body = el("div", { class: "folder-body" });
    for (const d of items) {
      body.append(el("div", { class: "kb-row" },
        el("span", { class: "kb-title", onclick: () => openEditor(d.id) },
          d.title || d.id || d.file),
        el("span", { class: "kb-meta" },
          `${(d.metadata && d.metadata.namespace) || ""} ${d.file}`),
        el("button", { class: "kb-del", onclick: () => delDoc(d.id) }, "刪除")));
    }
    tree.append(el("details", { class: "folder", open: "" },
      el("summary", {}, `📁 ${folder} (${items.length})`), body));
  }
  if (!docs.length) tree.append(el("div", {}, "（沒有文件）"));
}

async function search() {
  const q = $("kbSearch").value.trim();
  if (!q) return refresh();
  const tree = $("kbTree");
  tree.innerHTML = "搜尋中…";
  try {
    const out = await api.post("/search", { query: q, k: 20 });
    const docs = (out.hits || []).map((h) => ({
      id: h.id, title: (h.metadata && h.metadata.title) || h.id,
      metadata: h.metadata || {}, folder: "search results",
      file: (h.metadata && h.metadata.file_path) || "",
    }));
    renderTree(docs);
  } catch (e) { tree.innerHTML = "搜尋失敗: " + e.message; }
}

async function delDoc(id) {
  if (!confirm(`刪除 ${id}？`)) return;
  try { await api.del(`/docs/${encodeURIComponent(id)}`); refresh(); }
  catch (e) { alert("刪除失敗: " + e.message); }
}

/* ---------------- upload ---------------- */
async function upload(file) {
  const text = await file.text();
  let title = file.name.replace(/\.[^.]+$/, "");
  let content = text;
  let metadata = {};
  if (file.name.endsWith(".json")) {
    try {
      const doc = JSON.parse(text);
      title = doc.title || title;
      content = typeof doc.body === "string" ? doc.body :
        (doc.content || JSON.stringify(doc.body || doc, null, 2));
      metadata = doc.metadata || { namespace: doc.namespace, canonicality: doc.canonicality };
    } catch { /* treat as raw text */ }
  }
  try {
    const out = await api.post("/docs/save", { title, content, metadata });
    alert("已上傳: " + out.id);
    refresh();
  } catch (e) { alert("上傳失敗: " + e.message); }
}

/* ---------------- recursive JSON tree editor ---------------- */
function buildTreeEditor(value, onChange) {
  if (value !== null && typeof value === "object") {
    const isArray = Array.isArray(value);
    const box = el("div", { class: "jt-node" });
    const renderChildren = () => {
      box.innerHTML = "";
      const entries = isArray ? value.map((v, i) => [i, v]) : Object.entries(value);
      for (const [key, v] of entries) {
        const row = el("div", { class: "jt-row" });
        let keyInput = null;
        if (!isArray) {
          keyInput = el("input", { class: "jt-key", value: String(key) });
          keyInput.addEventListener("change", () => {
            const nv = value[key];
            delete value[key];
            value[keyInput.value] = nv;
            onChange();
            renderChildren();
          });
          row.append(keyInput);
        } else {
          row.append(el("span", { class: "jt-key" }, `[${key}]`));
        }
        row.append(buildTreeEditor(v, onChange, (nv) => {
          value[key] = nv;
          onChange();
        }));
        row.append(el("button", {
          class: "jt-del", onclick: () => {
            if (isArray) value.splice(key, 1);
            else delete value[key];
            onChange();
            renderChildren();
          },
        }, "−"));
        box.append(row);
      }
      box.append(el("button", {
        class: "jt-add", onclick: () => {
          if (isArray) value.push("");
          else value["new_key_" + Object.keys(value).length] = "";
          onChange();
          renderChildren();
        },
      }, isArray ? "＋ 項目" : "＋ 欄位"));
    };
    renderChildren();
    return box;
  }
  // primitive leaf
  const input = el("input", { class: "jt-value", value: value === null ? "" : String(value) });
  const wrapper = el("span", { class: "jt-leaf" });
  wrapper.append(input);
  input.addEventListener("change", () => {
    let nv = input.value;
    if (nv === "true") nv = true;
    else if (nv === "false") nv = false;
    else if (nv !== "" && !isNaN(Number(nv))) nv = Number(nv);
    wrapper.dispatchEvent(new CustomEvent("jt-change", { detail: nv, bubbles: true }));
  });
  return wrapper;
}

function mountTreeEditor(container, obj) {
  container.innerHTML = "";
  // leaf changes bubble up as jt-change with the new value; rebind per leaf
  const rebuild = () => {
    container.innerHTML = "";
    const node = buildTreeEditor(obj, () => {});
    container.append(node);
  };
  container.addEventListener("jt-change", (e) => {
    // find the input's path is complex; simpler: read back all inputs on save
    e.stopPropagation();
  });
  rebuild();
}

/* Read the tree editor back into the object: leaves wrote via change events,
   but for robustness we re-walk inputs in DOM order matching object walk. */
function readBackTree(container, obj) {
  const inputs = container.querySelectorAll("input.jt-value");
  let i = 0;
  const walk = (v) => {
    if (v !== null && typeof v === "object") {
      const keys = Array.isArray(v) ? v.map((_, k) => k) : Object.keys(v);
      for (const k of keys) v[k] = walk(v[k]);
      return v;
    }
    const raw = inputs[i++]?.value ?? v;
    if (raw === "true") return true;
    if (raw === "false") return false;
    if (raw !== "" && !isNaN(Number(raw))) return Number(raw);
    return raw;
  };
  walk(obj);
  return obj;
}

/* ---------------- modal ---------------- */
async function openEditor(id) {
  try {
    const doc = await api.get(`/docs/${encodeURIComponent(id)}`);
    editingDoc = doc;
    $("modalTitle").textContent = `編輯 ${id}`;
    $("modalDocTitle").value = doc.title || "";
    $("modalDocContent").value = doc.content || "";
    editingDoc._meta = JSON.parse(JSON.stringify(doc.metadata || {}));
    mountTreeEditor($("jsonTree"), editingDoc._meta);
    $("kbModal").classList.remove("hidden");
  } catch (e) { alert("開啟失敗: " + e.message); }
}

async function saveEditor() {
  if (!editingDoc) return;
  const metadata = readBackTree($("jsonTree"), editingDoc._meta);
  try {
    await api.put(`/docs/${encodeURIComponent(editingDoc.id)}`, {
      title: $("modalDocTitle").value,
      content: $("modalDocContent").value,
      metadata,
    });
    closeModal();
    refresh();
  } catch (e) { alert("儲存失敗: " + e.message); }
}

function closeModal() {
  $("kbModal").classList.add("hidden");
  editingDoc = null;
}

/* ---------------- init ---------------- */
$("kbRefreshBtn").onclick = refresh;
$("kbSearchBtn").onclick = search;
$("kbSearch").addEventListener("keydown", (e) => { if (e.key === "Enter") search(); });
$("kbUpload").addEventListener("change", (e) => {
  if (e.target.files[0]) upload(e.target.files[0]);
  e.target.value = "";
});
$("modalSaveBtn").onclick = saveEditor;
$("modalCancelBtn").onclick = closeModal;
refresh();
