#!/usr/bin/env python
"""Static file server for cag-vis: serves the jsonData exports (the role of
the :8080 server in README.md:10) AND the web app itself, with CORS headers
so the app can also be opened from file://.

Usage: python cli/serve.py [jsonData-root] [--port 8080]
"""

import argparse
import functools
import os
import sys
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class Handler(SimpleHTTPRequestHandler):
    app_dir = os.path.join(REPO, "cag_vis")

    def end_headers(self):
        self.send_header("Access-Control-Allow-Origin", "*")
        super().end_headers()

    def translate_path(self, path):
        # /app/* serves the web app; everything else serves the data root
        if path.startswith("/app"):
            rel = path[len("/app"):].lstrip("/") or "index.html"
            return os.path.join(self.app_dir, rel)
        return super().translate_path(path)

    def log_message(self, fmt, *args):  # quieter
        sys.stderr.write("serve: " + fmt % args + "\n")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("root", nargs="?", default="jsonData",
                   help="directory with the evaluation JSON exports")
    p.add_argument("--port", type=int, default=8080)
    a = p.parse_args(argv)

    os.chdir(a.root)
    server = ThreadingHTTPServer(("0.0.0.0", a.port), Handler)
    print(f"serving {os.getcwd()} on :{a.port} (web app at /app)")
    server.serve_forever()


if __name__ == "__main__":
    main()
