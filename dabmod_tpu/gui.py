"""Web GUI: a small HTTP server exposing the remote control as JSON plus a
single-page parameter browser (role of the reference's CherryPy GUI,
python/gui.py + python/gui/api.py).

Run standalone against a modulator's ZMQ RC:

    python -m dabmod_tpu.gui --rc tcp://localhost:9400 --port 8099
"""
from __future__ import annotations

import argparse
import json
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!doctype html>
<html><head><title>dabmod-tpu</title>
<style>
 body { font-family: sans-serif; margin: 2em; }
 table { border-collapse: collapse; }
 td, th { border: 1px solid #ccc; padding: 4px 10px; }
 input { width: 8em; }
</style></head>
<body>
<h1>dabmod-tpu remote control</h1>
<div id="content">loading...</div>
<script>
async function refresh() {
  const r = await fetch('/api/rc');
  const mods = await r.json();
  let html = '';
  for (const [mod, params] of Object.entries(mods)) {
    html += `<h2>${mod}</h2><table>`;
    for (const [p, v] of Object.entries(params)) {
      html += `<tr><td>${p}</td><td>${v}</td>
        <td><input id="${mod}.${p}"/>
        <button onclick="setp('${mod}','${p}')">set</button></td></tr>`;
    }
    html += '</table>';
  }
  document.getElementById('content').innerHTML = html;
}
async function setp(mod, p) {
  const v = document.getElementById(mod + '.' + p).value;
  await fetch(`/api/rc/set?controllable=${mod}&param=${p}&value=` +
              encodeURIComponent(v), {method: 'POST'});
  refresh();
}
refresh();
setInterval(refresh, 5000);
</script>
</body></html>
"""


def make_handler(rc):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/json"):
            data = body.encode() if isinstance(body, str) else body
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                self._send(200, _PAGE, "text/html")
            elif self.path.startswith("/api/rc"):
                out = {}
                try:
                    for mod in rc.get_modules():
                        out[mod] = rc.show(mod)
                    self._send(200, json.dumps(out))
                except Exception as e:          # noqa: BLE001
                    self._send(500, json.dumps({"error": str(e)}))
            else:
                self._send(404, "{}")

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/api/rc/set":
                q = urllib.parse.parse_qs(parsed.query)
                try:
                    rc.set_param_value(q["controllable"][0], q["param"][0],
                                       q["value"][0])
                    self._send(200, '{"ok": true}')
                except Exception as e:          # noqa: BLE001
                    self._send(500, json.dumps({"error": str(e)}))
            else:
                self._send(404, "{}")

        def log_message(self, fmt, *args):      # quiet
            pass

    return Handler


def serve(rc_endpoint: str, port: int):
    from .rc.client import ModRemoteControl
    rc = ModRemoteControl(rc_endpoint)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(rc))
    return httpd


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rc", default="tcp://localhost:9400")
    ap.add_argument("--port", type=int, default=8099)
    args = ap.parse_args(argv)
    httpd = serve(args.rc, args.port)
    print(f"GUI on http://127.0.0.1:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
