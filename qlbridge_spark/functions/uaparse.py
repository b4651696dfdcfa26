"""User-agent parsing tables — a vendored SUBSET of the public uap-core
project's regexes.yaml knowledge (ua-parser/uap-core, Apache-2.0), hand-
reduced to the ~30 highest-traffic browser/OS families so the ``useragent``
builtin can answer real-world UAs without an external dependency.

Reference parity: /root/reference/expr/builtins/url_email.go:694-831 wraps
the mssola/user_agent Go library with parts {bot, mobile, mozilla,
platform, os, engine, engine_version, browser, browser_version}. This
module supplies the same parts; family naming follows uap-core ("Mobile
Safari", "Chrome Mobile iOS", "Samsung Internet", …), which is the
industry-standard labeling. Divergence (documented): ``os`` returns the
uap-core OS FAMILY ("Mac OS X"), not the raw token the Go lib returns
("Intel Mac OS X 10_15_7").

ORDER MATTERS: first match wins, so forks embed-testing their upstream's
token (Edge > Chrome > Safari; Samsung Internet > Chrome; …) are listed
before it, exactly as uap-core orders its YAML. Patterns stay in the
common subset of Java (Spark ``rlike``) and Python ``re`` syntax so the
JVM Column path and the row-eval (pyeval) path share one table and stay
in lockstep — the parity suite compares them directly.
"""

from __future__ import annotations

import re

# (family, detect regex, version regex — group 1 captures "maj.min…")
_V = r"(\d+(?:\.\d+)*)"
UA_FAMILIES: list[tuple[str, str, str | None]] = [
    # -- bots / fetch tools (embed browser tokens → must come first) ----
    ("Googlebot", r"Googlebot", rf"Googlebot/{_V}"),
    ("bingbot", r"bingbot", rf"bingbot/{_V}"),
    ("DuckDuckBot", r"DuckDuckBot", rf"DuckDuckBot[-/]{_V}"),
    ("HeadlessChrome", r"HeadlessChrome", rf"HeadlessChrome/{_V}"),
    ("curl", r"^curl/", rf"curl/{_V}"),
    ("Wget", r"^Wget/", rf"Wget/{_V}"),
    ("Python Requests", r"python-requests/", rf"python-requests/{_V}"),
    ("Python-urllib", r"Python-urllib", rf"Python-urllib/{_V}"),
    ("okhttp", r"okhttp/", rf"okhttp/{_V}"),
    ("Apache-HttpClient", r"Apache-HttpClient", rf"Apache-HttpClient/{_V}"),
    # -- desktop/mobile browser forks before their upstream -------------
    ("Electron", r"Electron/", rf"Electron/{_V}"),
    ("Yandex Browser", r"YaBrowser/", rf"YaBrowser/{_V}"),
    ("UC Browser", r"UCBrowser/|UC Browser", rf"UC ?Browser/{_V}"),
    ("Samsung Internet", r"SamsungBrowser/", rf"SamsungBrowser/{_V}"),
    ("Whale", r"Whale/", rf"Whale/{_V}"),
    ("Vivaldi", r"Vivaldi/", rf"Vivaldi/{_V}"),
    ("QQ Browser", r"QQBrowser/", rf"QQBrowser/{_V}"),
    ("Opera Mini", r"Opera Mini", rf"Opera Mini/{_V}"),
    ("Opera Mobile", r"Opera Mobi", rf"Version/{_V}"),
    ("Opera", r"OPR/|Opera[ /]", rf"(?:OPR|Opera)[ /]{_V}"),
    ("Edge Mobile", r"EdgA/|EdgiOS/", rf"Edg(?:A|iOS)/{_V}"),
    ("Edge", r"Edge?/", rf"Edge?/{_V}"),
    ("Chrome Mobile iOS", r"CriOS/", rf"CriOS/{_V}"),
    ("Firefox iOS", r"FxiOS/", rf"FxiOS/{_V}"),
    ("Chrome Mobile WebView", r"; ?wv\).*Chrome/", rf"Chrome/{_V}"),
    ("Chrome Mobile", r"Chrome/[\d.]+ Mobile|Android.*Chrome/", rf"Chrome/{_V}"),
    ("Chrome", r"Chrome/", rf"Chrome/{_V}"),
    ("Firefox Mobile", r"Android.*Firefox/|Firefox/[\d.]+ (Mobile|Tablet)", rf"Firefox/{_V}"),
    ("Firefox", r"Firefox/", rf"Firefox/{_V}"),
    ("IE Mobile", r"IEMobile", rf"IEMobile[ /]{_V}"),
    ("IE", r"MSIE |Trident/", rf"(?:MSIE |rv:){_V}"),
    ("Mobile Safari", r"(iPhone|iPad|iPod).*Safari/", rf"Version/{_V}"),
    ("Safari", r"Safari/", rf"Version/{_V}"),
]

OS_FAMILIES: list[tuple[str, str]] = [
    ("Windows Phone", r"Windows Phone"),
    ("Android", r"Android"),
    ("iOS", r"iPhone|iPad|iPod|iOS"),
    ("Chrome OS", r"CrOS"),
    ("Mac OS X", r"Mac OS X|Macintosh"),
    ("Ubuntu", r"Ubuntu"),
    ("Windows", r"Windows"),
    ("FreeBSD", r"FreeBSD"),
    ("Linux", r"Linux|X11"),
]

ENGINES: list[tuple[str, str]] = [
    ("Gecko", r"Gecko/"),
    ("Trident", r"Trident/"),
    ("Presto", r"Presto/"),
    ("AppleWebKit", r"AppleWebKit/"),
]

BOT_RE = r"(?i)bot|crawler|spider|slurp|curl/|wget/|python-requests|python-urllib|httpclient|okhttp"
MOBILE_RE = r"Mobile|Android|iPhone|iPad|iPod|Opera Mini|Opera Mobi|IEMobile|Windows Phone"
MOZILLA_RE = rf"Mozilla/{_V}"
PLATFORM_RE = r"\(([^;)]+)[;)]"
ENGINE_VERSION_RE = rf"(?:AppleWebKit|Gecko|Trident|Presto)/{_V}"

#: parts the reference's switch accepts (url_email.go:757-779) plus the
#: uap-core-style aliases the engine historically exposed
PARTS = (
    "browser",
    "browser_version",
    "os",
    "os_family",
    "os_raw",
    "ua_family",
    "bot",
    "mobile",
    "mozilla",
    "platform",
    "engine",
    "engine_version",
)

# "os" (r16 default, reference parity) and its alias "os_raw": the raw
# OS token of the UA comment, in the style of the Go lib the reference
# wraps (mssola user_agent ua.OS(), url_email.go:766): Windows NT
# versions map to marketing names, underscore version separators
# normalize to dots, other platforms return their comment token.
# "os_family" keeps the uap-core FAMILY (the superset part).
WIN_NT_RE = r"Windows NT (\d+\.\d+)"
WIN_NT_NAMES = {
    "10.0": "Windows 10",
    "6.3": "Windows 8.1",
    "6.2": "Windows 8",
    "6.1": "Windows 7",
    "6.0": "Windows Vista",
    "5.2": "Windows XP x64 Edition",
    "5.1": "Windows XP",
    "5.0": "Windows 2000",
}
#: (pattern, normalize_underscores) — the underscore→dot rewrite applies
#: only to version-bearing Apple tokens; "Linux x86_64" keeps its
#: underscore
OS_RAW_RES = (
    (r"((?:Intel|PPC) Mac OS X [\d_.]+)", True),
    (r"(CPU (?:iPhone )?OS [\d_]+ like Mac OS X)", True),
    (r"(Android[ \d.]*\d)", False),
    (r"(CrOS [^;)]+)", False),
    (r"(Linux [^;)]+)", False),
    (r"(Linux)", False),
)


# -- pure-Python evaluation (pyeval row path) -------------------------------
def _pick(s: str, table) -> str:
    for entry in table:
        if re.search(entry[1], s):
            return entry[0]
    return "Other"


def _extract(s: str, pat: str) -> str:
    m = re.search(pat, s)
    return m.group(1) if m else ""


def parse_part(s: str, part: str) -> str:
    """Evaluate one ``useragent(ua, part)`` part over a python string —
    MUST stay output-identical to ``part_col`` (pyeval parity suite)."""
    part = part.lower()
    if part in ("ua_family", "browser"):
        return _pick(s, UA_FAMILIES)
    if part == "os_family":
        return _pick(s, OS_FAMILIES)
    if part == "browser_version":
        fam = _pick(s, UA_FAMILIES)
        vpat = next((v for f, _, v in UA_FAMILIES if f == fam), None)
        return _extract(s, vpat) if vpat else ""
    if part in ("os", "os_raw"):
        m = re.search(WIN_NT_RE, s)
        if m:
            return WIN_NT_NAMES.get(m.group(1), f"Windows NT {m.group(1)}")
        for pat, norm in OS_RAW_RES:
            m = re.search(pat, s)
            if m:
                return m.group(1).replace("_", ".") if norm else m.group(1)
        return ""
    if part == "bot":
        return "true" if re.search(BOT_RE, s) else "false"
    if part == "mobile":
        return "true" if re.search(MOBILE_RE, s) else "false"
    if part == "mozilla":
        return _extract(s, MOZILLA_RE)
    if part == "platform":
        return _extract(s, PLATFORM_RE)
    if part == "engine":
        return _pick(s, ENGINES)
    if part == "engine_version":
        return _extract(s, ENGINE_VERSION_RE)
    return ""


# -- Column evaluation (JVM path — when-chains + regexp_extract) ------------
def part_col(c, part: str):
    """Build the Column expression for one part: ordered rlike when-chain
    (first match wins, same order as the python table) — whole-stage
    codegen territory, no UDF."""
    from pyspark.sql import functions as F

    part = part.lower()
    if part in ("ua_family", "browser"):
        return _pick_col(c, [(f, p) for f, p, _ in UA_FAMILIES])
    if part == "os_family":
        return _pick_col(c, OS_FAMILIES)
    if part == "browser_version":
        out = F.lit("")
        for fam, det, vpat in reversed(UA_FAMILIES):
            if vpat is not None:
                out = F.when(c.rlike(det), F.regexp_extract(c, vpat, 1)).otherwise(out)
        return out
    if part in ("os", "os_raw"):
        out = F.lit("")
        for pat, norm in reversed(OS_RAW_RES):
            ext = F.regexp_extract(c, pat, 1)
            out = F.when(ext != "", F.translate(ext, "_", ".") if norm else ext).otherwise(out)
        win = F.regexp_extract(c, WIN_NT_RE, 1)
        wname = F.concat(F.lit("Windows NT "), win)
        for ver, name in WIN_NT_NAMES.items():
            wname = F.when(win == ver, F.lit(name)).otherwise(wname)
        return F.when(win != "", wname).otherwise(out)
    if part == "bot":
        return F.when(c.rlike(BOT_RE), F.lit("true")).otherwise(F.lit("false"))
    if part == "mobile":
        return F.when(c.rlike(MOBILE_RE), F.lit("true")).otherwise(F.lit("false"))
    if part == "mozilla":
        return F.regexp_extract(c, MOZILLA_RE, 1)
    if part == "platform":
        return F.regexp_extract(c, PLATFORM_RE, 1)
    if part == "engine":
        return _pick_col(c, ENGINES)
    if part == "engine_version":
        return F.regexp_extract(c, ENGINE_VERSION_RE, 1)
    return F.lit("")


def _pick_col(c, table):
    from pyspark.sql import functions as F

    out = F.lit("Other")
    for name, pat in reversed(table):
        out = F.when(c.rlike(pat), F.lit(name)).otherwise(out)
    return out
