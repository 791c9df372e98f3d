"""Minimal DOM + fetch stubs for driving cag_vis/*.js under tools/jsmini.

Implements exactly the browser surface the app touches (grepped from the
sources, tests/test_webapp_js.py asserts behavior): getElementById /
createElement(NS) / appendChild / setAttribute / addEventListener /
innerHTML clearing / canvas 2d context / XMLSerializer / Image / fetch
over a directory of exported JSONs (the real jsonData tree cli/evaluate.py
writes). Everything crossing into JS uses JS value conventions (floats,
UNDEF), matching the jsmini evaluator.
"""

from __future__ import annotations

import json
import os
import urllib.parse

from tools.jsmini import JSPromise, UNDEF, js_str


class Style:
    def __init__(self):
        self.__dict__["props"] = {}

    def __setattr__(self, k, v):
        self.props[k] = v

    def __getattr__(self, k):
        return self.props.get(k, "")


class BaseVal:
    def __init__(self, value):
        self.value = value


class Dim:
    def __init__(self, value):
        self.baseVal = BaseVal(value)


class Element:
    def __init__(self, tag, document=None, ns=None):
        self.tagName = tag
        self.namespaceURI = ns
        self.document = document
        self.attrs = {}
        self.children = []
        self.listeners = {}
        self.style = Style()
        self.textContent = ""
        self.className = ""
        # free-form JS props (canvas.width, a.download, input.value ...)
        self.type = ""
        self.value = ""
        self.checked = False
        self.name = ""
        self.min = 0.0
        self.max = 0.0
        self.step = 0.0
        self.width = 0.0
        self.height = 0.0
        self.download = ""
        self.href = ""
        self.src = ""
        self.onload = None

    # innerHTML: the app only ever assigns "" to clear
    @property
    def innerHTML(self):
        return ""

    @innerHTML.setter
    def innerHTML(self, v):
        if js_str(v) == "":
            self.children = []

    def setAttribute(self, k, v):
        self.attrs[js_str(k)] = js_str(v)

    def getAttribute(self, k):
        return self.attrs.get(js_str(k), None)

    def removeAttribute(self, k):
        self.attrs.pop(js_str(k), None)

    def appendChild(self, child):
        self.children.append(child)
        return child

    def addEventListener(self, name, fn):
        self.listeners.setdefault(js_str(name), []).append(fn)

    def click(self):
        self.fire("click", {})

    def fire(self, name, event=None):
        for fn in self.listeners.get(name, []):
            fn(event if event is not None else {})

    def querySelector(self, sel):
        sel = js_str(sel)
        for el in self.walk():
            if el.tagName == sel:
                return el
        return None

    def walk(self):
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.walk()

    def getContext(self, kind):
        if not hasattr(self, "_ctx"):
            self._ctx = Context2D()
        return self._ctx

    def toDataURL(self, kind="image/png"):
        return "data:image/png;base64,stub"

    def find_all(self, tag=None, attr=None, value=None):
        out = []
        for el in self.walk():
            if tag is not None and el.tagName != tag:
                continue
            if attr is not None and el.attrs.get(attr) != value:
                continue
            out.append(el)
        return out


class Context2D:
    def __init__(self):
        self.fillStyle = ""
        self.ops = []
        self.image_data = None

    def createImageData(self, w, h):
        return {"data": [0.0] * int(4 * w * h), "width": w, "height": h}

    def putImageData(self, img, x, y):
        self.image_data = img
        self.ops.append(("putImageData", x, y))

    def fillRect(self, x, y, w, h):
        self.ops.append(("fillRect", x, y, w, h))

    def drawImage(self, img, x, y):
        self.ops.append(("drawImage", x, y))


class TextNode:
    def __init__(self, text):
        self.textContent = text
        self.tagName = "#text"


class Document:
    def __init__(self):
        self.by_id = {}
        self.created = []

    def register(self, el_id, el):
        self.by_id[el_id] = el
        return el

    def getElementById(self, el_id):
        return self.by_id.get(js_str(el_id), None)

    def createElement(self, tag):
        el = Element(js_str(tag), self)
        self.created.append(el)
        return el

    def createElementNS(self, ns, tag):
        el = Element(js_str(tag), self, ns=js_str(ns))
        self.created.append(el)
        return el

    def createTextNode(self, text):
        return TextNode(js_str(text))


class XMLSerializer:
    def serializeToString(self, el):
        attrs = "".join(f' {k}="{v}"' for k, v in el.attrs.items())
        inner = "".join(
            self.serializeToString(c) if isinstance(c, Element) else js_str(c.textContent)
            for c in el.children
        )
        return f"<{el.tagName}{attrs}>{inner}</{el.tagName}>"


class Image(Element):
    """Setting .src fires onload synchronously (the app assigns onload
    before src, savePng at cag_vis/heatmap.js:246-261)."""

    def __init__(self):
        super().__init__("img")

    def __setattr__(self, k, v):
        object.__setattr__(self, k, v)
        if k == "src" and getattr(self, "onload", None):
            from tools.jsmini import _call

            _call(self.onload, [])


def _jsify(x):
    if isinstance(x, bool) or x is None:
        return x
    if isinstance(x, (int, float)):
        return float(x)
    if isinstance(x, list):
        return [_jsify(y) for y in x]
    if isinstance(x, dict):
        return {k: _jsify(v) for k, v in x.items()}
    return x


def make_fetch(root, base_url="http://localhost:8080", log=None):
    """fetch() over a directory tree: <base_url>/<path> -> <root>/<path>.
    Returns resolved JSPromises (jsmini's await unwraps synchronously)."""

    def fetch(url):
        url = js_str(url)
        if log is not None:
            log.append(url)
        if url.startswith(base_url):
            rel = url[len(base_url):].lstrip("/")
        else:
            rel = url.split("://", 1)[-1].split("/", 1)[-1]
        rel = urllib.parse.unquote(rel)
        path = os.path.join(root, rel)
        if not os.path.isfile(path):
            return JSPromise({
                "ok": False, "status": 404.0,
                "json": lambda: JSPromise(error={"name": "Error", "message": "404"}),
            })
        with open(path) as f:
            data = _jsify(json.load(f))
        return JSPromise({
            "ok": True, "status": 200.0,
            "json": lambda: JSPromise(data),
        })

    return fetch


def make_app_document():
    """A Document pre-registered with every element id app.js looks up
    (cag_vis/index.html contract)."""
    doc = Document()
    for el_id in ("status", "angle-readout", "options", "save-png"):
        doc.register(el_id, Element("div", doc))
    for el_id in ("canvas-pred", "canvas-org", "canvas-diff"):
        doc.register(el_id, Element("canvas", doc))
    svg = Element("svg", doc)
    svg.width = Dim(400.0)
    svg.height = Dim(400.0)
    doc.register("heatmap", svg)
    legend = Element("svg", doc)
    legend.width = Dim(300.0)
    legend.height = Dim(60.0)
    doc.register("legend", legend)
    return doc


def host_globals(doc, fetch):
    """The host globals dict for Interpreter(host=...) runs of cag_vis."""
    return {
        "document": doc,
        "fetch": fetch,
        "XMLSerializer": lambda: XMLSerializer(),
        "Image": lambda: Image(),
        "window": {},
    }
