"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the tables specified in ``FIXTURES.md`` — all derived from a seed,
no external data:

- ``pages``:    (url:string, warc_ts:timestamp[us], html:binary,
                text:string, lang:string) — exactly the BASELINE.json
                ``input_hint`` shape.  ``text`` is the golden extraction
                output: :func:`crawler_ray.functions.extract.extract_page`
                run with the job_type the crawl assigns to that URL.
- ``robots``:   (host, user_agent, disallow, allow, crawl_delay, sitemaps)
- ``sitemaps``: (url, kind, body) — xml / index / text variants
- ``seeds``:    (url, job_type)

Site shape (per host): home -> category list pages (paginated) -> post
detail pages, plus about/contact generic pages, a deep chain past the
depth limit, robots-disallowed pages, sitemap-only orphan pages,
query-string/fragment link variants (normalization tests,
``utils/http.py:512-531``), javascript:/mailto:/tel:/# distractors
(``utils/text.py:436-437``), external links, boilerplate + ad-class blocks
(``core/content_extractor.py:328-347``), date/author variants
(``core/content_extractor.py:454-553``) and duplicated article bodies
(similarity-hash dedup, ``models/content.py:70-102``).

Hosts follow a Zipf page-count distribution so one mega-host exists (skew
handling per the north rule).  Page metadata ("plans") are built cheaply on
the driver; HTML rendering + golden extraction fan out over Ray
``map_batches`` for large corpora (``generate_corpus(..., use_ray=True)``).
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_ray.functions.extract import extract_page

__all__ = ["build_site_plan", "render_page", "generate_corpus",
           "job_type_for_url", "PAGES_SCHEMA"]

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

# Deterministic word material.  The Persian list mixes Arabic-form
# characters (ك ي ة أ آ) and Arabic-Indic digits so normalization
# (``utils/text.py:19-39``) has work to do, and includes keyword-dictionary
# terms so the keyword classifier produces labels.
_EN_WORDS = (
    "law court judge contract claim appeal ruling statute evidence trial "
    "property damages liability counsel verdict motion clause tenant lease "
    "estate heir notary filing docket brief remedy breach tort equity"
).split()
_FA_WORDS = (
    "قانون دادگاه قاضی قرارداد شکایت تجدیدنظر رای ماده دلیل محاکمه "
    "ملك وكيل خسارت مشاور حكم دادخواست اجاره مستأجر ارث وصیت سند پرونده "
    "جرم مجازات دیه طلاق مهریه شرکت سهام چک مقاله بررسی تحلیل پژوهش ؟ "
    "تاریخ آیین‌نامه ١٢٣ ٤٥٦"
).split()
_SLUGS = ("intro guide review update notice analysis report summary "
          "question answer profile case study news brief").split()
_AUTHORS_EN = ["Sara Ahmadi", "Reza Karimi", "Nima Rad", "Lina Moradi"]
_AUTHORS_FA = ["علی رضایی", "مریم احمدی", "حسن کریمی", "زهرا موسوی"]

_POSTS_PER_LIST_PAGE = 10


def _page_rng(seed: int, url: str) -> random.Random:
    digest = hashlib.sha1(f"{seed}:{url}".encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def _words(rng: random.Random, n: int, lang: str) -> str:
    pool = _FA_WORDS if lang == "fa" else _EN_WORDS
    return " ".join(rng.choice(pool) for _ in range(n))


def _sentence(rng: random.Random, lang: str) -> str:
    end = "؟" if (lang == "fa" and rng.random() < 0.2) else "."
    return _words(rng, rng.randint(6, 14), lang).capitalize() + end


def _paragraph(rng: random.Random, lang: str) -> str:
    return " ".join(_sentence(rng, lang) for _ in range(rng.randint(2, 5)))


def job_type_for_url(url: str) -> str:
    """Job type the crawl assigns to a URL — delegates to the engine's
    default URL pattern classifier so generator golden text, the serial
    oracle and the Ray pipeline agree on job_type everywhere."""
    from crawler_ray.functions.patterns import default_url_classifier
    return default_url_classifier().job_type(url)


# ---------------------------------------------------------------------------
# site planning (driver-side, metadata only)
# ---------------------------------------------------------------------------

def _host_name(k: int) -> str:
    return f"site{k}.example"


def _zipf_page_counts(n_pages: int, n_hosts: int) -> list[int]:
    weights = np.array([1.0 / (k + 1) for k in range(n_hosts)])
    weights /= weights.sum()
    counts = np.maximum((weights * n_pages).astype(int), 12)
    return counts.tolist()


def build_site_plan(n_pages: int = 1000, n_hosts: int = 1,
                    seed: int = 42) -> list[dict]:
    """Page descriptors for all hosts.  Pure metadata — cheap on the driver
    even for 10^5-page corpora (HTML is rendered later, in parallel)."""
    plans: list[dict] = []
    for k, host_pages in enumerate(_zipf_page_counts(n_pages, n_hosts)):
        plans.extend(_plan_host(_host_name(k), host_pages, seed))
    return plans


def _plan_host(host: str, n_pages: int, seed: int) -> list[dict]:
    rng = random.Random(f"{seed}:{host}")
    base = f"https://{host}"
    # budget: fixed pages (home, about, contact, deep x6, private x2,
    # orphans x3) + lists + posts
    n_fixed = 13
    n_posts = max(6, int((n_pages - n_fixed) * 0.85))
    n_cats = max(2, n_posts // 40)
    cats = [f"cat{c}" for c in range(n_cats)]
    posts = []
    for i in range(1, n_posts + 1):
        slug = rng.choice(_SLUGS)
        lang = "fa" if rng.random() < 0.6 else "en"
        # every 13th post duplicates the body of an earlier canonical post
        dup_of = i - 1 - ((i - 1) % 13) + 1 if (i % 13 == 0 and i > 13) else None
        posts.append({
            "kind": "post", "host": host, "url": f"{base}/post/{i}-{slug}",
            "post_id": i, "cat": cats[i % n_cats], "lang": lang,
            "dup_of": dup_of,
            # every 17th post cites a URL that is never rendered: the
            # deterministic 404 population that exercises the fetch-miss /
            # failed-URL bookkeeping (M26) — real crawls always have them
            "broken_url": (f"{base}/missing/{i}" if i % 17 == 0 else None),
        })
    post_urls = [p["url"] for p in posts]

    plans: list[dict] = []
    list_pages = []
    for cat in cats:
        cat_posts = [p["url"] for p in posts if p["cat"] == cat]
        n_lp = max(1, (len(cat_posts) + _POSTS_PER_LIST_PAGE - 1)
                   // _POSTS_PER_LIST_PAGE)
        for pg in range(1, n_lp + 1):
            url = (f"{base}/category/{cat}/" if pg == 1
                   else f"{base}/category/{cat}/page/{pg}")
            chunk = cat_posts[(pg - 1) * _POSTS_PER_LIST_PAGE:
                              pg * _POSTS_PER_LIST_PAGE]
            list_pages.append({
                "kind": "list", "host": host, "url": url, "cat": cat,
                "page_no": pg, "n_list_pages": n_lp, "post_urls": chunk,
                "lang": "fa" if rng.random() < 0.5 else "en",
            })

    # related links must point at real posts (the oracle fetch-joins them)
    for idx, p in enumerate(posts):
        p["related_urls"] = [post_urls[(idx - 1) % len(post_urls)],
                             post_urls[(idx - 2) % len(post_urls)]]

    cat_first_pages = [lp["url"] for lp in list_pages if lp["page_no"] == 1]
    home = {
        "kind": "home", "host": host, "url": f"{base}/",
        "cat_urls": cat_first_pages,
        "latest_posts": post_urls[-8:],
        "query_link": post_urls[0] + "?ref=home" if post_urls else None,
        "deep_link": f"{base}/deep/1",
        "lang": "en",
    }
    plans.append(home)
    plans.extend(list_pages)
    plans.extend(posts)
    for name in ("about", "contact"):
        plans.append({"kind": "generic", "host": host,
                      "url": f"{base}/{name}", "lang": "en",
                      "link_urls": [f"{base}/", post_urls[0]] if post_urls
                      else [f"{base}/"]})
    for d in range(1, 7):  # chain deeper than max_depth=5
        plans.append({"kind": "deep", "host": host,
                      "url": f"{base}/deep/{d}", "depth_no": d,
                      "next_url": f"{base}/deep/{d + 1}" if d < 6 else None,
                      "lang": "en"})
    for p in (1, 2):  # robots-disallowed
        plans.append({"kind": "private", "host": host,
                      "url": f"{base}/private/{p}", "lang": "en"})
    for o in (1, 2, 3):  # sitemap-only orphans
        plans.append({"kind": "orphan", "host": host,
                      "url": f"{base}/orphan/{o}", "lang": "en"})
    return plans


# ---------------------------------------------------------------------------
# HTML rendering (parallelizable; pure function of (plan, seed))
# ---------------------------------------------------------------------------

def _nav(base: str, cat_urls: list[str]) -> str:
    items = "".join(f'<li><a href="{u}">cat</a></li>' for u in cat_urls[:5])
    return (f'<nav class="main-menu"><ul>{items}'
            f'<li><a href="{base}/about">About</a></li>'
            f'<li><a href="{base}/private/1">Private</a></li>'
            f'<li><a href="#top">Top</a></li>'
            f'<li><a href="javascript:void(0)">JS</a></li></ul></nav>')


def _boilerplate(rng: random.Random) -> tuple[str, str]:
    head_extra = ("<script>var x=1;function f(){return 'junk';}</script>"
                  "<style>.a{color:red}</style>")
    ad = rng.choice(["banner-ads", "advertisement", "popup-box",
                     "social-sharing"])
    body_junk = (f'<div class="{ad}">Buy now! <a href="https://ads.example/'
                 f'{rng.randint(1, 99)}">ad</a></div>')
    return head_extra, body_junk


def _date_block(rng: random.Random, lang: str) -> str:
    y, m, d = rng.randint(2018, 2024), rng.randint(1, 12), rng.randint(1, 28)
    style = rng.randrange(4)
    if style == 0:
        return f'<time datetime="{y}-{m:02d}-{d:02d}">{y}/{m}/{d}</time>'
    if style == 1:
        return (f'<meta property="article:published_time" '
                f'content="{y}-{m:02d}-{d:02d}T08:00:00">')
    if style == 2:
        return f'<span class="pubdate">{y}/{m}/{d}</span>'
    return f"<p>تاریخ انتشار: {y}/{m}/{d}</p>" if lang == "fa" else ""


def _author_block(rng: random.Random, lang: str) -> str:
    name = rng.choice(_AUTHORS_FA if lang == "fa" else _AUTHORS_EN)
    style = rng.randrange(4)
    if style == 0:
        return f'<meta name="author" content="{name}">'
    if style == 1:
        return f'<span class="author-name">نویسنده: {name}</span>'
    if style == 2:
        return f"<p>نویسنده: {name}</p>" if lang == "fa" else ""
    return ""


def _render_body_article(rng: random.Random, lang: str,
                         n_paras: int) -> str:
    paras = "".join(f"<p>{_paragraph(rng, lang)}</p>"
                    for _ in range(n_paras))
    date_html = _date_block(rng, lang)
    author_html = _author_block(rng, lang)
    meta_bits = ""
    inline_bits = ""
    for bit in (date_html, author_html):
        if bit.startswith("<meta"):
            meta_bits += bit
        else:
            inline_bits += bit
    return meta_bits, f"{inline_bits}{paras}"


def render_page(plan: dict, seed: int = 42, page_scale: int = 1) -> dict:
    """Render one page plan to a pages-table row (pure, deterministic).

    ``page_scale`` multiplies article length: scale 1 gives ~1-2 KB posts
    (unit-test speed); scale 8+ approximates real Common-Crawl page sizes
    so benchmarks are extraction-compute-bound like production.  Duplicate
    bodies stay duplicates at any scale (same body RNG stream)."""
    url = plan["url"]
    host = plan["host"]
    base = f"https://{host}"
    lang = plan.get("lang", "en")
    rng = _page_rng(seed, url)
    kind = plan["kind"]
    site_word = "Site " + host.split(".")[0]

    nav = _nav(base, plan.get("cat_urls", [f"{base}/category/cat0/"]))
    head_extra, body_junk = _boilerplate(rng)

    if kind == "post":
        dup_src = plan.get("dup_of")
        body_rng = (_page_rng(seed, f"{base}/post-body/{dup_src}")
                    if dup_src else _page_rng(seed, f"{base}/post-body/"
                                              f"{plan['post_id']}"))
        meta_bits, article_inner = _render_body_article(
            body_rng, lang, body_rng.randint(3, 7) * page_scale)
        title_txt = f"Post {plan['post_id']} {_words(rng, 3, lang)}"
        related = "".join(f'<a href="{u}">related {i}</a>'
                          for i, u in enumerate(plan.get("related_urls", [])))
        cat_link = f'<a href="{base}/category/{plan["cat"]}/">back</a>'
        if plan.get("broken_url"):
            cat_link += f'<a href="{plan["broken_url"]}">source</a>'
        html = (f"<html><head><title>{title_txt} | {site_word}</title>"
                f"{meta_bits}{head_extra}</head><body>"
                f"<header><h2>{site_word}</h2></header>{nav}"
                f'<div class="head-block"><h1>{title_txt}</h1></div>'
                f"<article>{article_inner}</article>"
                f'<div class="related-posts">{related}{cat_link}</div>'
                f"{body_junk}"
                f'<footer><a href="{base}/contact">contact</a>'
                f'<a href="mailto:x@{host}">mail</a></footer>'
                f"</body></html>")
    elif kind == "list":
        items = []
        for u in plan["post_urls"]:
            pid = u.rsplit("/post/", 1)[1]
            items.append(
                f'<div class="post-item"><h3><a href="{u}">Post {pid}</a>'
                f'</h3><p class="summary">{_sentence(rng, lang)}</p></div>')
        pg, n_lp = plan["page_no"], plan["n_list_pages"]
        pag = ""
        if pg < n_lp:
            nxt = f"{base}/category/{plan['cat']}/page/{pg + 1}"
            pag += f'<a class="next" href="{nxt}">next</a>'
        if pg > 1:
            prv = (f"{base}/category/{plan['cat']}/" if pg == 2 else
                   f"{base}/category/{plan['cat']}/page/{pg - 1}")
            pag += f'<a class="prev" href="{prv}">prev</a>'
        html = (f"<html><head><title>Category {plan['cat']} page {pg} | "
                f"{site_word}</title>{head_extra}</head><body>"
                f"<header><h2>{site_word}</h2></header>{nav}"
                f'<div class="posts-list">{"".join(items)}</div>'
                f'<div class="pagination">{pag}</div>{body_junk}'
                f"<footer>footer text</footer></body></html>")
    elif kind == "home":
        latest = "".join(f'<div class="post-item"><h3><a href="{u}">'
                         f"{u.rsplit('/', 1)[1]}</a></h3></div>"
                         for u in plan["latest_posts"])
        extra = (f'<a href="{plan["query_link"]}">featured</a>'
                 if plan.get("query_link") else "")
        extra += (f'<a href="{plan["deep_link"]}">archive</a>'
                  if plan.get("deep_link") else "")
        html = (f"<html><head><title>Welcome | {site_word}</title>"
                f"{head_extra}</head><body>"
                f"<header><h2>{site_word}</h2></header>{nav}"
                f'<div class="intro"><p>{_paragraph(rng, lang)}</p></div>'
                f'<div class="posts-list">{latest}</div>{extra}'
                f'<a href="https://other.example/x">elsewhere</a>'
                f'<a href="tel:+123456">call</a>{body_junk}'
                f'<footer><a href="{base}/contact">contact</a></footer>'
                f"</body></html>")
    elif kind == "deep":
        nxt = (f'<a href="{plan["next_url"]}">deeper</a>'
               if plan.get("next_url") else "")
        html = (f"<html><head><title>Deep {plan['depth_no']} | {site_word}"
                f"</title></head><body>{nav}"
                f"<div class='content-block'><p>{_paragraph(rng, lang)}</p>"
                f"{nxt}</div></body></html>")
    else:  # generic / private / orphan
        links = "".join(f'<a href="{u}">link</a>'
                        for u in plan.get("link_urls", []))
        html = (f"<html><head><title>{kind.title()} | {site_word}</title>"
                f"{head_extra}</head><body>"
                f"<header><h2>{site_word}</h2></header>{nav}"
                f'<div class="content-main"><p>{_paragraph(rng, lang)}</p>'
                f"<p>{_paragraph(rng, lang)}</p>{links}</div>{body_junk}"
                f"<footer>footer</footer></body></html>")

    html_bytes = html.encode("utf-8")
    golden = extract_page(html_bytes, url, job_type=job_type_for_url(url))
    ts_off = int.from_bytes(hashlib.sha1(url.encode()).digest()[:4], "big")
    warc_ts = 1_600_000_000_000_000 + (ts_off % 100_000_000) * 1_000_000
    return {"url": url, "warc_ts": warc_ts, "html": html_bytes,
            "text": golden["content"], "lang": lang}


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                type=pa.timestamp("us")),
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=PAGES_SCHEMA,
    )


# ---------------------------------------------------------------------------
# aux tables
# ---------------------------------------------------------------------------

def _robots_and_sitemaps(plans: list[dict], seed: int):
    by_host: dict[str, list[dict]] = {}
    for p in plans:
        by_host.setdefault(p["host"], []).append(p)

    robots_rows, sitemap_rows, seed_rows = [], [], []
    for host, host_plans in by_host.items():
        base = f"https://{host}"
        rng = random.Random(f"{seed}:robots:{host}")
        post_urls = [p["url"] for p in host_plans if p["kind"] == "post"]
        orphan_urls = [p["url"] for p in host_plans if p["kind"] == "orphan"]
        # real sites advertise most of their content in sitemaps; listing
        # every 2nd post keeps some pages discoverable only by link-walk
        # while making sitemap seeding carry real volume (fat early waves)
        in_sitemap = post_urls[::2] + orphan_urls

        kind = ["xml", "index", "text"][hash_mod(host, 3)]
        sm_url = f"{base}/sitemap.xml"
        if kind == "index":
            # sitemap index -> two child sitemaps (recursion test,
            # ``core/crawler.py:1312-1320``)
            half = len(in_sitemap) // 2
            child_urls = [f"{base}/sitemap-1.xml", f"{base}/sitemap-2.xml"]
            sitemap_rows.append(
                {"url": sm_url, "kind": "index",
                 "body": _sitemap_index_xml(child_urls).encode()})
            for cu, chunk in zip(child_urls,
                                 (in_sitemap[:half], in_sitemap[half:])):
                sitemap_rows.append({"url": cu, "kind": "xml",
                                     "body": _sitemap_xml(chunk).encode()})
        elif kind == "text":
            body = "# plain text sitemap\n" + "\n".join(in_sitemap) + "\n"
            sitemap_rows.append({"url": sm_url, "kind": "text",
                                 "body": body.encode()})
        else:
            sitemap_rows.append({"url": sm_url, "kind": "xml",
                                 "body": _sitemap_xml(in_sitemap).encode()})

        robots_rows.append({
            "host": host, "user_agent": "*",
            "disallow": ["/private/"], "allow": [],
            "crawl_delay": float(rng.choice([0.5, 1.0, 2.0])),
            "sitemaps": [sm_url],
        })
        seed_rows.append({"url": f"{base}/", "job_type": "page"})

    robots = pa.Table.from_pydict({
        "host": [r["host"] for r in robots_rows],
        "user_agent": [r["user_agent"] for r in robots_rows],
        "disallow": pa.array([r["disallow"] for r in robots_rows],
                             type=pa.list_(pa.string())),
        "allow": pa.array([r["allow"] for r in robots_rows],
                          type=pa.list_(pa.string())),
        "crawl_delay": pa.array([r["crawl_delay"] for r in robots_rows],
                                type=pa.float64()),
        "sitemaps": pa.array([r["sitemaps"] for r in robots_rows],
                             type=pa.list_(pa.string())),
    })
    sitemaps = pa.Table.from_pydict({
        "url": [r["url"] for r in sitemap_rows],
        "kind": [r["kind"] for r in sitemap_rows],
        "body": pa.array([r["body"] for r in sitemap_rows],
                         type=pa.binary()),
    })
    seeds = pa.Table.from_pydict({
        "url": [r["url"] for r in seed_rows],
        "job_type": [r["job_type"] for r in seed_rows],
    })
    return robots, sitemaps, seeds


def hash_mod(s: str, m: int) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:4], "big") % m


def _sitemap_xml(urls: list[str]) -> str:
    entries = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{entries}</urlset>")


def _sitemap_index_xml(urls: list[str]) -> str:
    entries = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in urls)
    return ('<?xml version="1.0" encoding="UTF-8"?>'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{entries}</sitemapindex>")


# ---------------------------------------------------------------------------
# top-level entry
# ---------------------------------------------------------------------------

def generate_corpus(out_dir: str, n_pages: int = 1000, n_hosts: int = 1,
                    seed: int = 42, use_ray: bool = False,
                    page_scale: int = 1) -> dict:
    """Generate the corpus tables under ``out_dir``.  Returns summary info.

    ``use_ray=True`` renders pages via ``map_batches`` (for 10^4+ page
    corpora); the default renders serially (unit-test scale).  Generation
    is idempotent: an existing ``_MANIFEST.json`` with the same parameters
    short-circuits.
    """
    import json
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    params = {"n_pages": n_pages, "n_hosts": n_hosts, "seed": seed,
              "page_scale": page_scale, "version": 5}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f)
        if old.get("params") == params:
            return old

    plans = build_site_plan(n_pages, n_hosts, seed)
    pages_path = os.path.join(out_dir, "pages")
    # regeneration must not leave stale parts from a previous parameterset
    import shutil
    shutil.rmtree(pages_path, ignore_errors=True)
    os.makedirs(pages_path, exist_ok=True)

    if use_ray:
        import ray.data as rd

        def _render_batch(batch: dict) -> pa.Table:
            rows = [render_page(json_loads(s), seed, page_scale=page_scale)
                    for s in batch["plan_json"]]
            return _rows_to_table(rows)

        import json as _json

        def json_loads(s):
            return _json.loads(s)

        plan_ds = rd.from_items(
            [{"plan_json": _json.dumps(p)} for p in plans])
        ds = plan_ds.map_batches(_render_batch, batch_format="numpy",
                                 batch_size=256)
        ds.write_parquet(pages_path)
    else:
        rows = [render_page(p, seed, page_scale=page_scale)
                for p in plans]
        pq.write_table(_rows_to_table(rows),
                       os.path.join(pages_path, "part-0.parquet"),
                       row_group_size=2048)

    robots, sitemaps, seeds = _robots_and_sitemaps(plans, seed)
    pq.write_table(robots, os.path.join(out_dir, "robots.parquet"))
    pq.write_table(sitemaps, os.path.join(out_dir, "sitemaps.parquet"))
    pq.write_table(seeds, os.path.join(out_dir, "seeds.parquet"))

    info = {"params": params, "n_plans": len(plans),
            "pages_path": pages_path,
            "hosts": sorted({p["host"] for p in plans})}
    with open(manifest_path, "w") as f:
        json.dump(info, f, indent=2)
    return info
