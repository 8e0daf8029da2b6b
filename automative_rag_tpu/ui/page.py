"""Single-page web UI served at /ui.

Functional parity with the reference's Streamlit pages (SURVEY.md §2.7:
主页/智能查询/数据摄取/文档浏览/后台任务/系统信息 + components): the same six
views as tabs in one dependency-free HTML page talking to this API (the
environment ships no Streamlit). Chinese-first labels, mode picker with the
per-mode parameter table, metadata filter widget, job polling, source and
validation display, job dashboard, worker/queue health.
"""

UI_HTML = """<!DOCTYPE html>
<html lang="zh">
<head>
<meta charset="utf-8">
<title>汽车智能问答系统 · TPU</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
:root { --bg:#0f1117; --card:#1a1d27; --line:#2a2e3d; --text:#e6e8ef;
        --dim:#9aa0b4; --accent:#4f8cff; --ok:#37c77b; --warn:#e8b339; --bad:#e5484d; }
* { box-sizing:border-box; margin:0; }
body { background:var(--bg); color:var(--text);
       font:14px/1.6 -apple-system,"PingFang SC","Microsoft YaHei",sans-serif; }
header { padding:14px 24px; border-bottom:1px solid var(--line);
         display:flex; gap:18px; align-items:center; }
header h1 { font-size:17px; }
nav { display:flex; gap:4px; }
nav button { background:none; border:none; color:var(--dim); padding:8px 14px;
             cursor:pointer; border-radius:8px; font-size:14px; }
nav button.active { background:var(--card); color:var(--text); }
main { max-width:1060px; margin:20px auto; padding:0 20px; }
.card { background:var(--card); border:1px solid var(--line); border-radius:12px;
        padding:16px; margin-bottom:14px; }
.row { display:flex; gap:10px; flex-wrap:wrap; align-items:center; }
input,select,textarea { background:#12141d; color:var(--text); border:1px solid var(--line);
        border-radius:8px; padding:8px 10px; font-size:14px; }
textarea { width:100%; min-height:90px; }
button.primary { background:var(--accent); color:#fff; border:none; border-radius:8px;
        padding:9px 18px; cursor:pointer; font-size:14px; }
button.ghost { background:none; border:1px solid var(--line); color:var(--dim);
        border-radius:8px; padding:7px 12px; cursor:pointer; }
.badge { display:inline-block; padding:2px 9px; border-radius:20px; font-size:12px; }
.badge.ok { background:#143a28; color:var(--ok); }
.badge.warn { background:#3a3114; color:var(--warn); }
.badge.bad { background:#3a1416; color:var(--bad); }
.badge.dim { background:#22263a; color:var(--dim); }
.grid { display:grid; grid-template-columns:repeat(auto-fill,minmax(220px,1fr)); gap:10px; }
.stat { background:#12141d; border-radius:10px; padding:12px; }
.stat b { font-size:20px; display:block; }
.stat span { color:var(--dim); font-size:12px; }
pre { background:#12141d; border-radius:8px; padding:10px; overflow:auto;
      font-size:12px; color:var(--dim); }
.answer { white-space:pre-wrap; background:#12141d; border-left:3px solid var(--accent);
          border-radius:8px; padding:14px; }
.src { border-top:1px dashed var(--line); padding:8px 0; font-size:13px; color:var(--dim); }
table { width:100%; border-collapse:collapse; font-size:13px; }
th,td { text-align:left; padding:7px 8px; border-bottom:1px solid var(--line); }
th { color:var(--dim); font-weight:normal; }
.hide { display:none; }
.modecard { cursor:pointer; border:1px solid var(--line); border-radius:10px;
            padding:10px; background:#12141d; }
.modecard.sel { border-color:var(--accent); }
.modecard b { display:block; }
.modecard span { font-size:12px; color:var(--dim); }
label { color:var(--dim); font-size:13px; }
</style>
</head>
<body>
<header>
  <h1>🚗 汽车智能问答 <span style="color:var(--dim);font-size:12px">TPU-native RAG</span></h1>
  <nav id="nav"></nav>
  <span id="healthdot" class="badge dim" style="margin-left:auto">…</span>
</header>
<main>

<section id="tab-home" class="card">
  <h2>系统概览</h2><br>
  <div class="grid" id="home-stats"></div><br>
  <h3>查询模式</h3><br>
  <div class="grid" id="home-modes"></div>
</section>

<section id="tab-query" class="hide">
  <div class="card">
    <h2>智能查询 <button class="ghost" onclick="toggleHelp('query')">ⓘ 帮助</button></h2>
    <div id="help-query" class="hide src"></div><br>
    <div class="grid" id="mode-picker"></div><br>
    <div id="mode-examples" class="src"></div>
    <div class="row" id="q-templates" style="margin:6px 0"></div>
    <input id="q-text" list="q-suggest" style="width:100%" placeholder="例如：宝马X5的百公里加速是多少？" oninput="suggest()">
    <datalist id="q-suggest"></datalist>
    <div id="q-hints"></div>
    <div class="row" style="margin-top:10px">
      <label>品牌 <input id="f-manu" size="8"></label>
      <label>车型 <input id="f-model" size="8"></label>
      <label>年款 <input id="f-year" size="5"></label>
      <label>验证 <select id="q-validate">
        <option value="">关闭</option>
        <option value="basic">基础</option>
        <option value="guided">引导式</option>
      </select></label>
      <button class="primary" onclick="submitQuery()">提交查询</button>
      <span id="q-status"></span>
    </div>
  </div>
  <div class="card">
    <h3>历史查询 <button class="ghost" onclick="loadHistory()">刷新</button></h3>
    <div id="q-history"></div>
  </div>
  <div class="card hide" id="q-pause">
    <h3>⏸️ 等待用户输入</h3>
    <div id="q-prompt" class="src"></div>
    <div class="row" style="margin-top:8px">
      <input id="q-contrib" size="50" placeholder="补充资料（将被摄取为新文档）">
      <button class="primary" onclick="contribute()">提交资料</button>
      <button class="ghost" onclick="userChoice('proceed')">直接继续</button>
    </div>
  </div>
  <div class="card hide" id="q-result">
    <h3>回答 <span id="q-conf" class="badge dim"></span></h3><br>
    <div class="answer" id="q-answer"></div>
    <div id="q-structured"></div>
    <div id="q-quality"></div>
    <div id="q-validation"></div>
    <h4 style="margin-top:12px">来源</h4>
    <div id="q-sources"></div>
  </div>
</section>

<section id="tab-ingest" class="hide">
  <div class="card">
    <h2>数据摄取 <button class="ghost" onclick="toggleHelp('ingest')">ⓘ 帮助</button></h2>
    <div id="help-ingest" class="hide src"></div>
  </div>
  <div class="card">
    <h2>数据摄取 — 文本</h2><br>
    <textarea id="i-text" placeholder="粘贴汽车相关文本…"></textarea>
    <div class="row" style="margin-top:8px">
      <button class="primary" onclick="ingestText()">摄取文本</button><span id="i-text-status"></span>
    </div>
  </div>
  <div class="card">
    <h2>数据摄取 — 视频</h2><br>
    <div class="row">
      <input id="i-url" size="50" placeholder="YouTube / Bilibili URL">
      <button class="primary" onclick="ingestVideo()">摄取视频</button><span id="i-video-status"></span>
    </div>
  </div>
  <div class="card">
    <h2>数据摄取 — 批量视频</h2><br>
    <textarea id="i-batch" placeholder="每行一个视频 URL（最多 100 个）；每个视频是独立任务，单个失败不影响其它"></textarea>
    <div class="row" style="margin-top:8px">
      <button class="primary" onclick="ingestBatch()">批量摄取</button><span id="i-batch-status"></span>
    </div>
    <div id="i-batch-jobs"></div>
  </div>
  <div class="card">
    <h2>数据摄取 — PDF</h2><br>
    <div class="row">
      <input type="file" id="i-pdf" accept="application/pdf">
      <button class="primary" onclick="ingestPdf()">上传并解析</button><span id="i-pdf-status"></span>
    </div>
  </div>
</section>

<section id="tab-browse" class="hide">
  <div class="card">
    <h2>文档浏览</h2><br>
    <div class="row">
      <label>模式 <select id="b-mode" onchange="browseModeChanged()">
        <option value="scroll">按元数据浏览</option>
        <option value="search">相关度检索</option>
      </select></label>
      <input id="b-query" size="24" placeholder="检索词" class="hide">
      <label>品牌 <input id="b-manu" size="8"></label>
      <label>车型 <input id="b-model" size="8"></label>
      <label>类别 <input id="b-cat" size="6"></label>
      <label>来源 <select id="b-source"><option value="">全部</option>
        <option>text</option><option>pdf</option><option>video</option><option>manual</option>
      </select></label>
      <label>年款 <input id="b-ygte" size="4" placeholder="从"> – <input id="b-ylte" size="4" placeholder="到"></label>
      <button class="primary" onclick="browsePage=0;browse()">查询</button>
    </div><br>
    <div id="b-analysis"></div>
    <div id="b-results"></div>
    <div class="row" style="margin-top:8px">
      <button class="ghost" onclick="browsePrev()">← 上一页</button>
      <span id="b-pageinfo" class="badge dim"></span>
      <button class="ghost" onclick="browseNext()">下一页 →</button>
    </div>
  </div>
  <div class="card hide" id="b-detail">
    <h3>📄 块详情 <button class="ghost" style="float:right" onclick="$('b-detail').classList.add('hide')">关闭</button></h3>
    <div id="b-detail-meta"></div>
    <pre id="b-detail-content" style="white-space:pre-wrap;color:var(--text)"></pre>
    <div id="b-detail-explain"></div>
    <div id="b-detail-siblings"></div>
  </div>
</section>

<section id="tab-jobs" class="hide">
  <div class="card">
    <h2>后台任务
      <button class="ghost" onclick="loadJobs()">刷新</button>
      <label style="margin-left:8px"><input type="checkbox" id="j-auto" onchange="jobsAutoRefresh()"> 自动刷新</label>
    </h2><br>
    <div class="grid" id="jobs-counts"></div><br>
    <div class="row">
      <label>类型 <select id="j-type" onchange="jobsPage=0;loadJobs()">
        <option value="">全部</option>
        <option value="text_processing">文本</option>
        <option value="pdf_processing">PDF</option>
        <option value="video_processing">视频</option>
        <option value="llm_inference">查询</option>
      </select></label>
      <label>状态 <select id="j-status" onchange="jobsPage=0;loadJobs()">
        <option value="">全部</option>
        <option>pending</option><option>processing</option><option>completed</option>
        <option>failed</option><option>timeout</option><option>cancelled</option>
        <option>waiting_user</option>
      </select></label>
      <button class="ghost" onclick="cleanupJobs()">清理过期任务</button>
      <span id="j-cleanup-status"></span>
    </div><br>
    <div id="jobs-table"></div>
    <div class="row" style="margin-top:8px">
      <button class="ghost" onclick="jobsPrev()">← 上一页</button>
      <span id="j-pageinfo" class="badge dim"></span>
      <button class="ghost" onclick="jobsNext()">下一页 →</button>
    </div>
  </div>
  <div class="card hide" id="j-detail">
    <h3>任务详情 <span id="j-detail-id" class="badge dim"></span>
      <button class="ghost" style="float:right" onclick="$('j-detail').classList.add('hide')">关闭</button></h3><br>
    <div id="j-detail-chain"></div>
    <div id="j-detail-validation"></div>
    <div id="j-detail-analysis"></div>
    <h4 style="margin-top:10px">进度流</h4>
    <div id="j-detail-progress"></div>
    <h4 style="margin-top:10px">结果</h4>
    <pre id="j-detail-result"></pre>
  </div>
</section>

<section id="tab-system" class="hide">
  <div class="card">
    <h2>系统信息
      <button class="ghost" onclick="loadSystem()">刷新</button>
      <button class="ghost" onclick="sysAction('/system/warmup','预热')">🔥 预热</button>
      <button class="ghost" onclick="sysAction('/system/rebuild-index','重建索引')">🧱 重建索引</button>
      <button class="ghost" onclick="toggleHelp('system')">ⓘ 帮助</button>
      <span id="sys-action-status"></span></h2>
    <div id="help-system" class="hide src"></div><br>
    <div class="grid" id="sys-stats"></div><br>
    <div id="sys-workers"></div><br>
    <div id="sys-queues"></div><br>
    <div id="sys-models"></div><br>
    <div id="sys-disk"></div>
  </div>
  <div class="card">
    <h4>使用分析</h4><div id="sys-analytics"></div><br>
    <h4>配置</h4><pre id="sys-config"></pre>
  </div>
</section>

</main>
<script>
const TABS = [["home","主页"],["query","智能查询"],["ingest","数据摄取"],
              ["browse","文档浏览"],["jobs","后台任务"],["system","系统信息"]];
let MODES = [], selMode = "facts";

const $ = id => document.getElementById(id);
const api = async (path, opts) => {
  const r = await fetch(path, opts);
  if (!r.ok) throw new Error((await r.json()).detail || r.status);
  return r.json();
};
const esc = s => String(s ?? "").replace(/[&<>"'`]/g,
  c => ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;","'":"&#39;","`":"&#96;"}[c]));

function show(tab) {
  TABS.forEach(([t]) => {
    $("tab-"+t).classList.toggle("hide", t !== tab);
    $("nav-"+t).classList.toggle("active", t === tab);
  });
  if (tab === "home") loadHome();
  if (tab === "query") { loadHistory(); loadTemplates(); }
  if (tab === "browse") browse();
  if (tab === "jobs") loadJobs();
  if (tab === "system") loadSystem();
}

async function loadHome() {
  try {
    const h = await api("/health");
    $("healthdot").textContent = "● " + h.status;
    $("healthdot").className = "badge ok";
    $("home-stats").innerHTML = `
      <div class="stat"><b>${h.index.count}</b><span>索引文档块</span></div>
      <div class="stat"><b>${h.jobs.total || 0}</b><span>历史任务</span></div>
      <div class="stat"><b>${Math.round(h.uptime_s)}s</b><span>运行时间</span></div>
      <div class="stat"><b>${h.index.dim}</b><span>向量维度</span></div>`;
  } catch (e) { $("healthdot").className = "badge bad"; $("healthdot").textContent = "离线"; }
  if (!MODES.length) {
    MODES = (await api("/query/modes")).modes;
    $("home-modes").innerHTML = MODES.map(m =>
      `<div class="modecard"><b>${m.icon} ${esc(m.name)}</b>
       <span>${m.mode} · 检索${m.retrieval_k}→${m.final_k} · ${esc(m.time_estimate)}</span></div>`).join("");
    $("mode-picker").innerHTML = MODES.map(m =>
      `<div class="modecard ${m.mode===selMode?"sel":""}" id="mode-${m.mode}"
            onclick="pickMode('${m.mode}')"><b>${m.icon} ${esc(m.name)}</b>
       <span>${m.mode} · ${esc(m.time_estimate)}</span></div>`).join("");
  }
}
function pickMode(m) {
  selMode = m;
  MODES.forEach(x => $("mode-"+x.mode).classList.toggle("sel", x.mode === m));
  const ex = TEMPLATES.filter(t => t.suggested_mode === m).flatMap(t => t.examples);
  $("mode-examples").innerHTML = ex.length
    ? "💡 示例: " + ex.slice(0,2).map(e =>
      `<a href="#" onclick="$('q-text').value='${esc(e)}';suggest();return false"
         style="color:var(--accent)">${esc(e)}</a>`).join(" · ")
    : "";
}

let TEMPLATES = [];
async function loadTemplates() {
  if (TEMPLATES.length) return;
  TEMPLATES = (await api("/query/templates")).templates;
  $("q-templates").innerHTML = "<label>快速模板:</label> " + TEMPLATES.map((t,i) =>
    `<button class="ghost" onclick="useTemplate(${i})">${t.icon} ${esc(t.category)}</button>`).join("");
}
function useTemplate(i) {
  const t = TEMPLATES[i];
  $("q-text").value = t.template;
  pickMode(t.suggested_mode);
}

async function toggleHelp(ctx) {
  const el = $("help-" + ctx);
  if (!el.classList.toggle("hide") && !el.innerHTML) {
    const h = await api("/system/help/" + ctx);
    el.innerHTML = `<b>${esc(h.title)}</b> — ${esc(h.body)}<br>💡 ${esc(h.tip)}`;
  }
}

let analyzeTimer = null;
function analyzeQuery() {
  clearTimeout(analyzeTimer);
  analyzeTimer = setTimeout(async () => {
    const q = $("q-text").value.trim();
    if (q.length < 2) { $("q-hints").innerHTML = ""; return; }
    const a = await api("/query/analyze", {method:"POST",
      headers:{"Content-Type":"application/json"}, body: JSON.stringify({query:q})});
    let html = a.strengths.map(s => `<span class="badge ok">✓ ${esc(s)}</span>`).join(" ");
    if (a.quality_score < 0.7 && a.suggestions.length)
      html += " " + a.suggestions.map(s => `<span class="badge warn">✨ ${esc(s)}</span>`).join(" ");
    const d = a.detected || {};
    if (d.manufacturer || d.model || d.year)
      html += ` <button class="ghost" onclick='applyDetected(${JSON.stringify(d)})'>应用筛选
        ${esc(d.manufacturer||"")} ${esc(d.model||"")} ${d.year||""}</button>`;
    $("q-hints").innerHTML = html ? "<div style='margin-top:6px'>" + html + "</div>" : "";
  }, 350);
}
function applyDetected(d) {
  if (d.manufacturer) $("f-manu").value = d.manufacturer;
  if (d.model) $("f-model").value = d.model;
  if (d.year) $("f-year").value = d.year;
}

function filterBody() {
  const f = {};
  if ($("f-manu").value) f.manufacturer = $("f-manu").value;
  if ($("f-model").value) f.model = $("f-model").value;
  if ($("f-year").value) f.year = parseInt($("f-year").value);
  return Object.keys(f).length ? f : null;
}

async function submitQuery() {
  const q = $("q-text").value.trim();
  if (!q) return;
  $("q-status").textContent = "提交中…";
  $("q-result").classList.add("hide");
  try {
    const vmode = $("q-validate").value;
    const sub = await api("/query", {method:"POST", headers:{"Content-Type":"application/json"},
      body: JSON.stringify({query:q, mode:selMode, metadata_filter:filterBody(),
                            validation: vmode === "guided" ? "guided" : vmode === "basic"})});
    window._activeJob = sub.job_id;
    streamAnswer(sub.job_id);   // SSE pushes partial text as it decodes
    pollQuery(sub.job_id, Date.now());  // polling owns final render/state
  } catch (e) { $("q-status").textContent = "错误: " + e.message; }
}

function streamAnswer(jobId) {
  // best-effort: polling still renders everything if SSE is unavailable
  if (typeof EventSource === "undefined") return;
  try {
    const es = new EventSource("/query/stream/" + jobId);
    es.addEventListener("partial", ev => {
      if (window._activeJob !== jobId) { es.close(); return; }
      const d = JSON.parse(ev.data);
      $("q-result").classList.remove("hide");
      $("q-answer").textContent = d.text + " ▌";  // textContent: no XSS sink
    });
    es.addEventListener("done", () => es.close());
    es.addEventListener("error", () => es.close());
    es.onerror = () => es.close();
  } catch (e) { /* stream is an enhancement only */ }
}

async function userChoice(choice) {
  await api(`/query/${window._activeJob}/user-choice`, {method:"POST",
    headers:{"Content-Type":"application/json"},
    body: JSON.stringify({user_choice: choice})});
  $("q-pause").classList.add("hide");
}

async function contribute() {
  const content = $("q-contrib").value.trim();
  if (!content) return;
  await api(`/query/${window._activeJob}/contribute`, {method:"POST",
    headers:{"Content-Type":"application/json"},
    body: JSON.stringify({content})});
  $("q-pause").classList.add("hide");
}

// Unified validation rendering (reference validation_display.py parity:
// summary badge + step bars + per-document status + document summary
// metrics + status-keyed user guidance + the help expander).
function renderValidation(v) {
  const hid = "val-help-" + (++_valHelpSeq);
  let html = `<br><h4>验证管线
    <span class="badge ${v.status==="passed"?"ok":v.status==="warning"?"warn":"bad"}">
    ${esc(String(v.status))} · ${esc(String(v.confidence))}</span>
    <button class="ghost" onclick="toggleValHelp('${hid}')" style="margin-left:6px">❓ 验证说明</button></h4>
    <div id="${hid}" class="hide src">验证分五步：检索充分性（候选数量达到模式要求）、
      来源可信度（官方文档 &gt; 专业评测 &gt; 用户内容）、技术一致性（数值是否在物理合理范围、
      是否存在乱码）、完整性（问题关键词是否被证据覆盖）、共识（多文档同一指标是否一致）。
      综合 ≥70 通过，40-69 提醒，&lt;40 不通过。guided 模式会在低可信时暂停等待用户补充证据。</div>`;
  html += Object.entries(v.steps || {}).map(([k,s]) => {
      const pct = Math.round(Math.max(0, Math.min(100, +s.score)));  // scores are 0-100
      const color = pct >= 70 ? "var(--ok)" : pct >= 40 ? "var(--warn)" : "var(--bad)";
      return `<div class="src">${esc(k)} — ${esc(s.detail)}
        <div style="background:#22263a;border-radius:4px;height:6px;margin-top:4px">
          <div style="background:${color};width:${pct}%;height:6px;border-radius:4px"></div>
        </div></div>`;
    }).join("");
  const ds = v.document_summary;
  if (ds && ds.total) {
    html += `<div class="grid" style="margin-top:8px">
      <div class="stat"><b>${+ds.total}</b><span>总文档数</span></div>
      <div class="stat"><b>${+ds.with_warnings}</b><span>包含提醒</span></div>
      <div class="stat"><b>${+ds.warning_rate}%</b><span>提醒率</span></div></div>`;
  }
  if ((v.documents || []).length) {
    html += "<h4>逐文档验证</h4>" + v.documents.map(d =>
      `<div class="src">${(d.warnings||[]).length ? "⚠️" : "✅"}
        <b>${esc(String(d.doc_id).slice(0,10))}</b>
        <span class="badge dim">${esc(d.source_type)}</span>
        可信 ${Math.round(+d.credibility)} · 相关 ${(+d.relevance).toFixed(2)}
        ${(d.warnings||[]).map(w => `<span class="badge warn">${esc(w)}</span>`).join(" ")}
      </div>`).join("");
  }
  // status-keyed user guidance (reference render_user_guidance)
  const GUIDANCE = {
    passed: "✅ 证据充分：答案基于多个可信来源且数值一致，可直接参考。",
    warning: "⚠️ 部分提醒：答案有文档支撑但存在来源单一/数值分歧等提醒，" +
             "建议核对引用来源，或补充更权威的文档后重试。",
    failed: "❌ 证据不足：检索到的文档无法充分支撑该问题，" +
            "请补充相关资料（数据摄取页）或放宽筛选条件后重试。",
  };
  const g = GUIDANCE[v.status];
  if (g) html += `<div class="src" style="margin-top:6px">${esc(g)}</div>`;
  return html;
}
let _valHelpSeq = 0;
function toggleValHelp(hid) { $(hid).classList.toggle("hide"); }
function toggleMetaCard(i) { $("meta-card-" + i).classList.toggle("hide"); }

// Per-source metadata summary card (reference metadata_display.py parity:
// typed metadata overview, quality indicators, content preview).
const META_GROUPS = [
  ["🚗 车辆", ["manufacturer", "model", "year", "category", "engine_type",
              "transmission"]],
  ["📄 来源", ["source", "source_id", "title", "author", "url", "keywords"]],
  ["🕒 时间", ["ingestion_time", "published", "duration"]],
];
function metaCard(s) {
  const md = s.metadata || {};
  let html = "";
  for (const [label, keys] of META_GROUPS) {
    const rows = keys.filter(k => md[k] !== undefined && md[k] !== null
                                  && md[k] !== "");
    if (!rows.length) continue;
    html += `<div style="margin-top:4px"><b>${label}</b> ` + rows.map(k =>
      `<span class="badge dim">${esc(k)}: ${esc(String(md[k]))}</span>`
    ).join(" ") + "</div>";
  }
  // quality indicators: key-field coverage + content agreement (does the
  // tagged model actually appear in the chunk text?)
  const key = ["manufacturer", "model", "year", "source"];
  const covered = key.filter(k => md[k]).length;
  const snippet = s.snippet || "";
  const agree = md.model ? (snippet.includes(String(md.model)) ? "✅ 内容一致"
                            : "⚠️ 正文未见型号") : "—";
  html += `<div style="margin-top:4px">
    <span class="badge ${covered >= 3 ? "ok" : covered >= 2 ? "warn" : "bad"}">
      关键元数据 ${covered}/${key.length}</span>
    <span class="badge dim">${esc(agree)}</span></div>`;
  if (snippet) html += `<div style="margin-top:4px;color:var(--dim)">
    ${esc(snippet)}${snippet.length >= 200 ? "…" : ""}</div>`;
  return html;
}

async function pollQuery(jobId, t0) {
  const job = await api("/query/results/" + jobId);
  if (job.status === "waiting_user") {
    const prog = await api(`/query/${jobId}/validation-progress`);
    $("q-pause").classList.remove("hide");
    $("q-prompt").textContent = (prog.user_prompt || {}).question || "需要用户输入";
    $("q-status").textContent = "等待输入…";
    setTimeout(() => pollQuery(jobId, t0), 900);
    return;
  }
  if (job.status === "completed" || job.status === "failed") {
    $("q-pause").classList.add("hide");
    $("q-status").textContent = job.status === "completed"
      ? `完成 (${((Date.now()-t0)/1000).toFixed(1)}s)` : "失败: " + esc(job.error);
    if (job.status !== "completed") return;
    const r = job.result;
    $("q-result").classList.remove("hide");
    $("q-answer").textContent = r.answer;
    const st = r.structured || {};
    let structuredHtml = "";
    // two-layer display (reference 智能查询.py:184-223): document-grounded
    // evidence vs clearly-marked AI reasoning
    const SECTION_STYLE = {
      "【实证分析】": ["📊 基于文档的实证分析", "var(--ok)"],
      "【文档支撑】": ["📋 文档支撑信息", "var(--ok)"],
      "【策略推理】": ["🧠 专业推理补充（AI推理，请结合实证参考）", "var(--warn)"],
      "【权衡分析】": ["⚖️ 权衡利弊分析", "var(--warn)"],
      "【场景推荐】": ["🎯 场景应用推理（AI推理）", "var(--warn)"],
    };
    if (st.sections) {
      for (const [head, body] of Object.entries(st.sections)) {
        const [label, color] = SECTION_STYLE[head] || [head, "var(--dim)"];
        structuredHtml += `<div class="answer" style="margin-top:8px;border-left-color:${color}">
          <b>${label}</b><br>${esc(body)}</div>`;
      }
    }
    if ((st.pros||[]).length || (st.cons||[]).length) {
      structuredHtml += "<br><h4>权衡</h4>" +
        (st.pros||[]).map(x => `<div class="src">✅ ${esc(x)}</div>`).join("") +
        (st.cons||[]).map(x => `<div class="src">⚠️ ${esc(x)}</div>`).join("");
    } else if ((st.viewpoints||[]).length) {
      structuredHtml += "<br><h4>观点</h4>" +
        st.viewpoints.map((x,i) => `<div class="src">🗣️ 观点${i+1}: ${esc(x)}</div>`).join("");
    } else if ((st.quotes||[]).length) {
      structuredHtml += "<br><h4>引用</h4>" +
        st.quotes.map(x => `<div class="src">💬 “${esc(x)}”</div>`).join("");
    }
    $("q-structured").innerHTML = structuredHtml;
    $("q-conf").textContent = "可信度 " + Math.round(r.confidence) + "/100";
    $("q-conf").className = "badge " + (r.confidence >= 70 ? "ok" : r.confidence >= 40 ? "warn" : "bad");
    // result quality indicator (reference result_quality.py:7-56): grade
    // from confidence, source citation coverage, and quality warnings
    const qc = r.quality_check || {};
    const srcs = r.sources || [];
    const cited = srcs.filter(s => s.cited).length;
    let q = (r.confidence || 0) / 100 * 0.6
          + (srcs.length ? cited / srcs.length : 0) * 0.3
          + ((qc.warnings || []).length ? 0 : 0.1);
    const grade = q >= 0.75 ? ["优秀","ok"] : q >= 0.5 ? ["良好","warn"] : ["需谨慎","bad"];
    $("q-quality").innerHTML = `<br><span class="badge ${grade[1]}">结果质量: ${grade[0]}
      (${Math.round(q*100)}/100)</span> <span class="badge dim">引用 ${cited}/${srcs.length} 来源</span> `
      + (qc.warnings || []).map(w => `<span class="badge warn">⚠️ ${esc(w)}</span>`).join(" ");
    $("q-sources").innerHTML = (r.sources || []).map((s, i) =>
      `<div class="src">${s.cited ? "✅" : "▫️"} <b>${s.doc_id}</b>
       ${esc(s.metadata.manufacturer||"")} ${esc(s.metadata.model||"")}
       ${s.metadata.year||""} · ${esc(s.metadata.source||"")}
       · 相关度 ${(+s.score).toFixed(2)}
       <button class="ghost" onclick="toggleMetaCard(${i})">🗂 元数据</button>
       <div id="meta-card-${i}" class="hide">${metaCard(s)}</div></div>`
      ).join("") || "<div class='src'>无来源</div>";
    const v = r.validation;
    $("q-validation").innerHTML = v ? renderValidation(v) : "";
  } else {
    $("q-status").textContent = `处理中 ${job.progress||0}%`;
    if (job.partial_answer) {  // streaming decode: show tokens as they land
      $("q-result").classList.remove("hide");
      $("q-answer").textContent = job.partial_answer + " ▌";
    }
    setTimeout(() => pollQuery(jobId, t0), 600);
  }
}

async function ingestText() {
  try {
    const r = await api("/ingest/text", {method:"POST", headers:{"Content-Type":"application/json"},
      body: JSON.stringify({content: $("i-text").value})});
    watchJob(r.job_id, "i-text-status");
  } catch (e) { $("i-text-status").textContent = "错误: " + e.message; }
}
async function ingestVideo() {
  try {
    const r = await api("/ingest/video", {method:"POST", headers:{"Content-Type":"application/json"},
      body: JSON.stringify({url: $("i-url").value})});
    watchJob(r.job_id, "i-video-status");
  } catch (e) { $("i-video-status").textContent = "错误: " + e.message; }
}
async function ingestBatch() {
  const urls = $("i-batch").value.split("\\n").map(u => u.trim()).filter(Boolean);
  if (!urls.length) return;
  try {
    const r = await api("/ingest/batch-videos", {method:"POST",
      headers:{"Content-Type":"application/json"}, body: JSON.stringify({urls})});
    $("i-batch-status").textContent = `已提交 ${r.accepted} 个任务，拒绝 ${r.rejected.length} 个`;
    const bad = r.rejected.map(x =>
      `<div class="src">✗ ${esc(x.url)} <span class="badge bad">${esc(x.reason)}</span></div>`).join("");
    const ids = new Set(r.job_ids);
    const render = async () => {
      // ONE list request per tick (not one per job): /ingest/jobs returns
      // the newest jobs; filter to this batch client-side
      const list = await api("/ingest/jobs?job_type=video_processing&limit=" +
                             Math.max(200, ids.size * 2));
      const rows = list.jobs.filter(j => ids.has(j.job_id)).map(j => {
        const cls = j.status === "completed" ? "ok" : j.status === "failed" ? "bad" : "warn";
        return `<div class="src">${j.job_id.slice(0,8)} · ${esc((j.metadata||{}).url||"")}
          <span class="badge ${cls}">${j.status} ${j.progress||0}%</span></div>`;
      });
      $("i-batch-jobs").innerHTML = bad + rows.join("");
      if (rows.some(x => x.includes("warn"))) setTimeout(render, 1500);
    };
    render();
  } catch (e) { $("i-batch-status").textContent = "错误: " + e.message; }
}

async function ingestPdf() {
  const file = $("i-pdf").files[0];
  if (!file) return;
  try {
    const r = await fetch("/ingest/pdf?filename=" + encodeURIComponent(file.name),
      {method:"POST", headers:{"Content-Type":"application/pdf"}, body: file});
    const body = await r.json();
    if (!r.ok) throw new Error(body.detail);
    watchJob(body.job_id, "i-pdf-status");
  } catch (e) { $("i-pdf-status").textContent = "错误: " + e.message; }
}
async function watchJob(jobId, el) {
  const job = await api("/ingest/jobs/" + jobId);
  if (job.status === "completed") {
    $(el).innerHTML = `<span class="badge ok">完成 · ${job.result.document_count||0} 块</span>`;
  } else if (job.status === "failed") {
    $(el).innerHTML = `<span class="badge bad">失败: ${esc(job.error)}</span>`;
  } else {
    $(el).textContent = `处理中 ${job.progress||0}%`;
    setTimeout(() => watchJob(jobId, el), 700);
  }
}

// ---------------------------------------------------------- 文档浏览
let browsePage = 0, browseHasMore = false;
const PAGE = 20;

function browseModeChanged() {
  $("b-query").classList.toggle("hide", $("b-mode").value !== "search");
}
function browsePrev() { if (browsePage > 0) { browsePage--; browse(); } }
function browseNext() { if (browseHasMore) { browsePage++; browse(); } }

function browseFilterQS() {
  const p = new URLSearchParams();
  if ($("b-manu").value) p.set("manufacturer", $("b-manu").value);
  if ($("b-model").value) p.set("model", $("b-model").value);
  if ($("b-cat").value) p.set("category", $("b-cat").value);
  if ($("b-source").value) p.set("source", $("b-source").value);
  if ($("b-ygte").value) p.set("year_gte", $("b-ygte").value);
  if ($("b-ylte").value) p.set("year_lte", $("b-ylte").value);
  return p;
}

async function browse() {
  $("b-detail").classList.add("hide");
  if ($("b-mode").value === "search") return browseSearch();
  const p = browseFilterQS();
  p.set("limit", PAGE);
  p.set("offset", browsePage * PAGE);
  const r = await api("/ingest/documents?" + p.toString());
  browseHasMore = r.has_more;
  $("b-analysis").innerHTML = `<span class="badge dim">索引共 ${r.total} 块 · 本页 ${r.count}</span><br><br>`;
  $("b-pageinfo").textContent = `第 ${browsePage + 1} 页`;
  $("b-results").innerHTML = r.documents.map(d =>
    `<div class="src" style="cursor:pointer" onclick="inspectDoc('${d.id}')">
     📄 <b>${esc(d.metadata.manufacturer||"?")} ${esc(d.metadata.model||"")}</b>
     ${d.metadata.year||""} <span class="badge dim">${esc(d.metadata.source||"?")}
     · 块${d.metadata.chunk_index ?? 0}</span><br>${esc(d.preview)}</div>`).join("")
    || "<div class='src'>无结果</div>";
}

async function browseSearch() {
  const body = {query: $("b-query").value || "汽车"};
  const f = {};
  if ($("b-manu").value) f.manufacturer = $("b-manu").value;
  if ($("b-model").value) f.model = $("b-model").value;
  if ($("b-cat").value) f.category = $("b-cat").value;
  if ($("b-source").value) f.source = $("b-source").value;
  if ($("b-ygte").value || $("b-ylte").value) {
    f.year = {};
    if ($("b-ygte").value) f.year.gte = parseInt($("b-ygte").value);
    if ($("b-ylte").value) f.year.lte = parseInt($("b-ylte").value);
  }
  if (Object.keys(f).length) body.metadata_filter = f;
  const r = await api("/query/debug-retrieval", {method:"POST",
    headers:{"Content-Type":"application/json"}, body: JSON.stringify(body)});
  browseHasMore = false;
  $("b-pageinfo").textContent = "";
  $("b-analysis").innerHTML = `<span class="badge dim">${r.count} 结果 ·
    检索 ${(r.timings.search_s*1000).toFixed(1)}ms · 重排 ${(r.timings.rerank_s*1000).toFixed(1)}ms</span><br><br>`;
  // query text rides a data attribute (HTML-escaped), never a JS string
  // literal — apostrophes/backticks in queries must not break or inject
  $("b-results").innerHTML = r.documents.map(d =>
    `<div class="src" style="cursor:pointer" data-id="${esc(d.id)}"
         data-q="${esc($("b-query").value)}"
         onclick="inspectDoc(this.dataset.id, this.dataset.q)">
     <b>${(+d.score).toFixed(2)}</b>
     ${esc(d.metadata.manufacturer||"?")} ${esc(d.metadata.model||"")} ${d.metadata.year||""}
     <br>${esc(d.preview)}</div>`).join("") || "无结果";
}

async function inspectDoc(docId, query) {
  const d = await api("/ingest/documents/" + docId);
  $("b-detail").classList.remove("hide");
  const m = d.metadata;
  $("b-detail-meta").innerHTML = ["manufacturer","model","year","category",
    "engine_type","transmission","source","chunk_index","total_chunks"]
    .filter(k => m[k] != null)
    .map(k => `<span class="badge dim" style="margin:2px">${k}: ${esc(m[k])}</span>`).join("")
    + ` <span class="badge dim">${d.length} 字</span>`;
  $("b-detail-content").textContent = d.content;
  $("b-detail-siblings").innerHTML = d.siblings.length
    ? "<h4 style='margin-top:10px'>同源块</h4>" + d.siblings.map(s =>
      `<div class="src" style="cursor:pointer" onclick="inspectDoc('${s.id}')">
       块${s.chunk_index ?? "?"} · ${esc(s.preview)}</div>`).join("")
    : "";
  $("b-detail-explain").innerHTML = "";
  if (query) {
    const ex = await api("/query/explain", {method:"POST",
      headers:{"Content-Type":"application/json"},
      body: JSON.stringify({query, doc_id: docId})});
    $("b-detail-explain").innerHTML = "<h4 style='margin-top:10px'>词元匹配解释</h4>" +
      ex.matches.map(x => `<div class="src">「${esc(x.query_token)}」 ↔ 「${esc(x.doc_token)}」
        · 相似度 ${(+x.similarity).toFixed(3)}</div>`).join("");
  }
}

// ---------------------------------------------------------- 后台任务
let jobsPage = 0, jobsHasMore = false, jobsTimer = null;

function jobsPrev() { if (jobsPage > 0) { jobsPage--; loadJobs(); } }
function jobsNext() { if (jobsHasMore) { jobsPage++; loadJobs(); } }
function jobsAutoRefresh() {
  clearInterval(jobsTimer);
  if ($("j-auto").checked) jobsTimer = setInterval(loadJobs, 2000);
}

const COUNT_LABELS = {total:"总数", completed:"完成", processing:"处理中",
  pending:"等待", failed:"失败", timeout:"超时", cancelled:"取消", waiting_user:"待输入"};

async function loadJobs() {
  const p = new URLSearchParams({limit: PAGE + 1, offset: jobsPage * PAGE});
  if ($("j-type").value) p.set("job_type", $("j-type").value);
  if ($("j-status").value) p.set("status", $("j-status").value);
  const r = await api("/ingest/jobs?" + p.toString());
  jobsHasMore = r.jobs.length > PAGE;
  const jobs = r.jobs.slice(0, PAGE);
  $("j-pageinfo").textContent = `第 ${jobsPage + 1} 页`;
  $("jobs-counts").innerHTML = Object.entries(r.counts)
    .filter(([k,v]) => v > 0 || k === "total")
    .map(([k,v]) => `<div class="stat"><b>${v}</b><span>${COUNT_LABELS[k]||k}</span></div>`).join("");
  $("jobs-table").innerHTML = `<table><tr><th>任务</th><th>类型</th><th>状态</th>
    <th>进度</th><th>更新时间</th><th></th></tr>` +
    jobs.map(j => {
      const v = ((j.result||{}).validation||{}).status;
      return `<tr>
      <td style="cursor:pointer" onclick="jobDetail('${j.job_id}')"><u>${j.job_id.slice(0,8)}</u></td>
      <td>${esc(j.job_type)}</td>
      <td><span class="badge ${j.status==="completed"?"ok":j.status==="failed"?"bad":"warn"}">${j.status}</span>
          ${v ? `<span class="badge ${v==="passed"?"ok":v==="warning"?"warn":"bad"}">验证:${v}</span>` : ""}</td>
      <td>${j.progress}%</td>
      <td>${new Date(j.updated_at*1000).toLocaleTimeString()}</td>
      <td><button class="ghost" onclick="deleteJob('${j.job_id}')">删除</button></td></tr>`;
    }).join("") + "</table>";
}

async function jobDetail(jobId) {
  const j = await api("/ingest/jobs/" + jobId);
  $("j-detail").classList.remove("hide");
  $("j-detail-id").textContent = jobId;
  $("j-detail-result").textContent = JSON.stringify(j.result || {}, null, 2).slice(0, 4000);
  const v = (j.result||{}).validation;
  // same widget as the query page: step bars + per-document status +
  // summary metrics + guidance (reference's 后台任务 job dashboard embeds
  // the full validation summary per job, 后台任务.py)
  $("j-detail-validation").innerHTML = v ? renderValidation(v) : "";
  try {
    const c = await api(`/ingest/jobs/${jobId}/chain`);
    $("j-detail-chain").innerHTML = "<h4>执行链</h4>" + c.steps.map((s, i) => {
      const st = c.step_status[s] || (i < c.current ? "completed" : "pending");
      const t = (c.step_timings||{})[s];
      return `<span class="badge ${st==="completed"?"ok":st==="failed"?"bad":"dim"}"
        style="margin:2px">${esc(s)}${t ? ` ${t.toFixed(1)}s` : ""}</span>`;
    }).join(" → ");
  } catch (e) { $("j-detail-chain").innerHTML = ""; }
  try {
    const pr = await api(`/ingest/jobs/${jobId}/progress`);
    $("j-detail-progress").innerHTML = pr.messages.slice(-30).map(m =>
      `<div class="src">${new Date(m.time*1000).toLocaleTimeString()} ·
       ${m.progress}% ${esc(m.message)}</div>`).join("") || "<div class='src'>无进度记录</div>";
  } catch (e) { $("j-detail-progress").innerHTML = ""; }
  try {
    const a = await api(`/ingest/jobs/${jobId}/analysis`);
    $("j-detail-analysis").innerHTML = a.chunks ? `<h4>摄取分析</h4>
      <div class="src">块数 ${a.chunks} · 总字数 ${a.total_chars}
       · 车辆识别率 ${(a.vehicle_detected_rate*100).toFixed(0)}%</div>
      <div class="src">元数据覆盖: ${Object.entries(a.metadata_coverage)
        .map(([k,x]) => `${k} ${(x*100).toFixed(0)}%`).join(" · ")}</div>` : "";
  } catch (e) { $("j-detail-analysis").innerHTML = ""; }
}

async function deleteJob(jobId) {
  await api("/ingest/jobs/" + jobId, {method: "DELETE"});
  loadJobs();
}

async function cleanupJobs() {
  const r = await api("/system/cleanup-jobs", {method:"POST",
    headers:{"Content-Type":"application/json"}, body: "{}"});
  $("j-cleanup-status").textContent = `已清理 ${r.removed} · 标记超时 ${r.marked_stalled}`;
  loadJobs();
}

let suggestTimer = null;
function suggest() {
  clearTimeout(suggestTimer);
  suggestTimer = setTimeout(async () => {
    const r = await api("/query/suggestions?prefix=" + encodeURIComponent($("q-text").value));
    $("q-suggest").innerHTML = r.suggestions.map(s => `<option value="${esc(s)}">`).join("");
  }, 250);
  analyzeQuery();
}

async function loadHistory() {
  const r = await api("/query/history?limit=10");
  $("q-history").innerHTML = r.history.map(h =>
    `<div class="src" style="cursor:pointer" data-q="${esc(h.query)}"
         onclick="$('q-text').value=this.dataset.q">
     ${esc(h.query)} <span class="badge dim">${h.mode} · ${(h.latency_s*1000).toFixed(0)}ms</span></div>`
  ).join("") || "<div class='src'>暂无历史</div>";
}

const fmtBytes = n => n >= 1<<30 ? (n/(1<<30)).toFixed(1)+" GB"
  : n >= 1<<20 ? (n/(1<<20)).toFixed(1)+" MB" : Math.round(n/1024)+" KB";

async function sysAction(path, label) {
  $("sys-action-status").textContent = label + "中…";
  try {
    await api(path, {method:"POST", headers:{"Content-Type":"application/json"}, body:"{}"});
    $("sys-action-status").innerHTML = `<span class="badge ok">${label}完成</span>`;
    loadSystem();
  } catch (e) { $("sys-action-status").innerHTML = `<span class="badge bad">${label}失败: ${esc(e.message)}</span>`; }
}

async function loadSystem() {
  const h = await api("/system/health/detailed");
  const idx = h.index || {};
  $("sys-stats").innerHTML = `
    <div class="stat"><b>${idx.count ?? 0}</b><span>索引文档块 (${esc(idx.kind||"")})</span></div>
    <div class="stat"><b>${fmtBytes(idx.hbm_bytes||0)}</b><span>索引 HBM 占用 · ${esc(idx.device_dtype||"")}</span></div>
    <div class="stat"><b>${idx.tail_rows ?? 0}</b><span>未合并新增 (fresh tail)</span></div>
    <div class="stat"><b>${Math.round(h.uptime_s||0)}s</b><span>运行时间</span></div>` +
    (h.sparse ? `
    <div class="stat"><b>${esc(h.sparse.rows ?? 0)}</b><span>词项索引行 (sparse${esc(h.sparse.kind==="sharded"?"·sharded":"")}) · ${esc(h.sparse.distinct_terms ?? 0)} 个词项</span></div>` : "");
  const w = await api("/workers/status");
  const hb = await api("/system/heartbeats");
  $("sys-workers").innerHTML = "<h4>工作线程</h4>" + Object.entries(w.workers).map(([k,v]) =>
    `<span class="badge ${v==="healthy"?"ok":v==="stale"?"warn":"bad"}" style="margin-right:6px">${k}: ${v}
     ${hb.workers && hb.workers[k] ? `(心跳 ${(+hb.workers[k].last_beat_age_s).toFixed(1)}s)` : ""}</span>`).join("");
  $("sys-queues").innerHTML = `<h4>队列</h4><table><tr><th>队列</th><th>等待</th><th>完成</th><th>失败</th><th>重试</th></tr>` +
    Object.entries(w.queues).map(([k,q]) =>
      `<tr><td>${k}</td><td>${q.pending}</td><td>${q.completed}</td><td>${q.failed}</td><td>${q.retried}</td></tr>`).join("") + "</table>";
  try {
    const m = await api("/model/status");
    $("sys-models").innerHTML = "<h4>模型状态</h4><table><tr><th>模型</th><th>状态</th><th>详情</th></tr>" +
      Object.entries(m).map(([k,v]) => `<tr><td>${esc(k)}</td>
        <td><span class="badge ${v.pretrained ? "ok" : "dim"}">${v.pretrained ? "已加载权重" : (v.mode || "内置模式")}</span></td>
        <td>${esc(v.path || "")} ${v.dim ? "dim="+v.dim : ""} ${v.backend ? esc(v.backend) : ""}</td></tr>`).join("") + "</table>";
  } catch (e) { $("sys-models").innerHTML = ""; }
  const du = await api("/system/disk-usage");
  $("sys-disk").innerHTML = `<h4>磁盘</h4><span class="badge ${du.free > du.total*0.1 ? "ok" : "warn"}">
    已用 ${fmtBytes(du.used)} / ${fmtBytes(du.total)} · 剩余 ${fmtBytes(du.free)}</span>`;
  const cfg = await api("/system/config");
  $("sys-config").textContent = JSON.stringify(cfg, null, 2);
  const an = await api("/system/analytics");
  $("sys-analytics").innerHTML = `<div class="grid">
    <div class="stat"><b>${an.total_queries ?? 0}</b><span>总查询数</span></div>
    <div class="stat"><b>${an.avg_latency_s != null ? (an.avg_latency_s*1000).toFixed(0)+"ms" : "—"}</b><span>平均时延</span></div>
    <div class="stat"><b>${esc(an.top_mode || "—")}</b><span>最常用模式</span></div>
    <div class="stat"><b>${(an.top_terms||[]).slice(0,3).map(t => esc(t[0])).join(" / ") || "—"}</b><span>热门词</span></div></div>`;
}

$("nav").innerHTML = TABS.map(([t,label]) =>
  `<button id="nav-${t}" onclick="show('${t}')">${label}</button>`).join("");
show("home");
</script>
</body>
</html>
"""
