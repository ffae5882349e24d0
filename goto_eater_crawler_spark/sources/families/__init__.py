"""Parse families.

The reference implements 47 Scrapy spiders + 2 standalone crawlers,
but they collapse into ~a dozen *parse families* — shapes of
(body format x pagination style x field layout). Each family module
here provides:

- ``gen_site(host, ...)`` — deterministic synthetic fixture site
  (the stand-in for the real web; pages are byte-reproducible),
- ``seeds(host)``        — seed frontier rows,
- ``extract_batch(pdf)`` — the ENGINE extractor: a pandas-batch
  function run inside ``mapInPandas`` over (url, html) Arrow batches;
  returns (records_pdf, links_pdf),
- ``oracle_parse(url, body)`` — an independent single-page Python
  parser mirroring the reference spider's control flow, used by the
  straight-line crawl oracle in tests (SURVEY.md §5.3).

Registry: FAMILIES maps family name -> module.
"""

from __future__ import annotations

from . import (
    cards,
    csv_body,
    excel_html,
    js_object,
    json_api,
    json_positional,
    label_table,
    list_xpath,
    mesh_json,
    pdf_tabula,
    session_token,
    wp_search_json,
    xlsx_body,
)

FAMILIES = {
    "list_xpath": list_xpath,
    "json_api": json_api,
    "json_positional": json_positional,
    "label_table": label_table,
    "wp_search_json": wp_search_json,
    "csv_body": csv_body,
    "js_object": js_object,
    "xlsx_body": xlsx_body,
    "pdf_tabula": pdf_tabula,
    "mesh_json": mesh_json,
    "session_token": session_token,
    "excel_html": excel_html,
    "cards": cards,
}
