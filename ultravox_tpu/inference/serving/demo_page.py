"""Built-in browser demo (reference: tools/gradio_demo.py — text+audio chat).

A single static page served at ``/`` by the API server: text chat plus WAV
file upload (and mic capture where the browser records WAV), streaming
responses over SSE from ``/v1/chat/completions``. No gradio dependency.
"""

DEMO_HTML = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>ultravox-tpu demo</title>
<style>
  body { font-family: system-ui, sans-serif; max-width: 780px; margin: 2rem auto; padding: 0 1rem; background: #101418; color: #e6e6e6; }
  h1 { font-size: 1.2rem; }
  #chat { border: 1px solid #2a3340; border-radius: 8px; padding: 1rem; min-height: 300px; }
  .msg { margin: .5rem 0; white-space: pre-wrap; }
  .user { color: #8ec7ff; }
  .assistant { color: #b5f1c2; }
  .meta { color: #8a93a0; font-size: .8rem; }
  #controls { display: flex; gap: .5rem; margin-top: 1rem; }
  input[type=text] { flex: 1; padding: .5rem; background: #1a222c; color: #e6e6e6; border: 1px solid #2a3340; border-radius: 6px; }
  button { padding: .5rem 1rem; background: #2d5f8a; color: white; border: 0; border-radius: 6px; cursor: pointer; }
  button:disabled { opacity: .5; }
</style>
</head>
<body>
<h1>ultravox-tpu — speech+text chat</h1>
<div id="chat"></div>
<div id="controls">
  <input type="text" id="text" placeholder="Type a message; attach a WAV to ask about audio"/>
  <input type="file" id="audio" accept=".wav,audio/wav"/>
  <button id="send">Send</button>
</div>
<div class="meta" id="status"></div>
<script>
const history = [];
function addMsg(role, text) {
  const div = document.createElement('div');
  div.className = 'msg ' + role;
  div.textContent = (role === 'user' ? 'you: ' : 'model: ') + text;
  document.getElementById('chat').appendChild(div);
  return div;
}
async function fileToB64(file) {
  const buf = await file.arrayBuffer();
  let s = '';
  const bytes = new Uint8Array(buf);
  for (let i = 0; i < bytes.length; i += 0x8000)
    s += String.fromCharCode.apply(null, bytes.subarray(i, i + 0x8000));
  return btoa(s);
}
document.getElementById('send').onclick = async () => {
  const textEl = document.getElementById('text');
  const audioEl = document.getElementById('audio');
  const btn = document.getElementById('send');
  const text = textEl.value.trim();
  if (!text && !audioEl.files.length) return;
  btn.disabled = true;
  const content = [];
  if (text) content.push({type: 'text', text: text + (audioEl.files.length ? ' ' : '')});
  if (audioEl.files.length) {
    content.push({type: 'input_audio',
      input_audio: {data: await fileToB64(audioEl.files[0]), format: 'wav'}});
  }
  addMsg('user', text + (audioEl.files.length ? ' [audio]' : ''));
  history.push({role: 'user', content: content.length === 1 && text ? text : content});
  const div = addMsg('assistant', '');
  const t0 = performance.now();
  let first = null;
  const resp = await fetch('/v1/chat/completions', {
    method: 'POST', headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({model: 'ultravox-tpu', messages: history,
                          max_tokens: 256, stream: true})});
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let acc = '', buf = '';
  while (true) {
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream: true});
    const events = buf.split('\\n\\n'); buf = events.pop();
    for (const ev of events) {
      if (!ev.startsWith('data: ') || ev.includes('[DONE]')) continue;
      const delta = JSON.parse(ev.slice(6)).choices[0].delta.content;
      if (delta) {
        if (first === null) first = performance.now() - t0;
        acc += delta;
        div.textContent = 'model: ' + acc;
      }
    }
  }
  history.push({role: 'assistant', content: acc});
  document.getElementById('status').textContent =
    'TTFT ' + (first || 0).toFixed(0) + ' ms · total ' +
    (performance.now() - t0).toFixed(0) + ' ms';
  textEl.value = ''; audioEl.value = ''; btn.disabled = false;
};
</script>
</body>
</html>
"""
