"""Embedded persistent table store with the reference indexer's API.

The reference keeps all pipeline state in HBase-over-Thrift
(reference: cufacesearch/indexer/hbase_indexer_minimal.py:70-912): an images
table ``{info: {...}, ext: {...}}`` keyed by sha1 and an updates table keyed
by ``index_update_<extr>_<YYYY-MM-DD>_<seq>``, with scan/batch-get/batch-put
plus update bookkeeping (created/started/processed/completed columns).

The TPU-native framework replaces the HBase cluster with an embedded sqlite3
store (native C engine, WAL-mode, single file) exposing the same method
surface, so the checker/processor/searcher logic is portable and a single
node needs no Java infrastructure. Row keys sort lexicographically exactly
like HBase row keys, so scan semantics carry over.
"""

import datetime
import sqlite3
import threading

from columbiaimagesearch_tpu.extraction.featsio import featB64decode

# Schema constants (reference: hbase_indexer_minimal.py:17-47)
UPDATE_INFOCF = "info"
UPDATE_LISTSHA1CNAME = "list_sha1s"
IMG_INFOCF = "info"
IMG_BUFFCNAME = "img_buffer"
IMG_URLCNAME = "s3_url"
IMG_URLBACKUPCNAME = "location"
IMG_PATHCNAME = "img_path"
EXTR_CF = "ext"
EXTR_STR_PROCESSED = "processed"
EXTR_STR_FAILED = "failed"
UPDATE_STR_PROCESSED = "processed"
UPDATE_STR_STARTED = "started"
UPDATE_STR_CREATED = "created"
UPDATE_STR_COMPLETED = "completed"
UPDATE_PREFIX = "index_update_"
UPDATE_BATCH_SIZE = 1000
MAX_ROWS = 500
READ_BATCH_SIZE = 100
MAX_ROW_SIZE = 2097152  # 2 MB row guard (reference line 34)


class KVIndexer:
    """sqlite3-backed row/column store with HBase-flavored scans."""

    def __init__(self, path=":memory:", table_sha1infos="images",
                 table_updateinfos="updates", batch_update_size=UPDATE_BATCH_SIZE):
        self.path = path
        self.table_sha1infos_name = table_sha1infos
        self.table_updateinfos_name = table_updateinfos
        self.batch_update_size = batch_update_size
        self.extrcf = EXTR_CF
        self.imginfocf = IMG_INFOCF
        self.updateinfocf = UPDATE_INFOCF
        self.dict_up = {}
        self.verbose = 0
        # One shared connection serialized by a lock: works for ':memory:'
        # databases (thread-local connections would each see an empty DB)
        # and keeps multi-threaded API/pipeline access safe.
        self._lock = threading.RLock()
        self._shared = sqlite3.connect(self.path, timeout=60,
                                       check_same_thread=False)
        self._shared.execute("PRAGMA journal_mode=WAL")
        self._shared.execute("PRAGMA synchronous=NORMAL")
        self._init_schema()

    # ------------------------------------------------------------ plumbing

    def _conn(self):
        return self._shared

    def _init_schema(self):
        conn = self._conn()
        conn.execute(
            "CREATE TABLE IF NOT EXISTS kv ("
            " tbl TEXT NOT NULL, row TEXT NOT NULL, col TEXT NOT NULL,"
            " val BLOB, PRIMARY KEY (tbl, row, col))")
        conn.execute(
            "CREATE INDEX IF NOT EXISTS kv_scan ON kv (tbl, row)")
        conn.commit()

    def get_create_table(self, table_name, families=None):
        """Tables are implicit; kept for API parity
        (reference: hbase_indexer_minimal.py:284-329)."""
        del families
        return table_name

    # ------------------------------------------------------------- columns

    def get_col_upproc(self):
        return self.updateinfocf + ":" + UPDATE_STR_PROCESSED

    def get_col_upstart(self):
        return self.updateinfocf + ":" + UPDATE_STR_STARTED

    def get_col_upcomp(self):
        return self.updateinfocf + ":" + UPDATE_STR_COMPLETED

    def get_col_upcreate(self):
        return self.updateinfocf + ":" + UPDATE_STR_CREATED

    def get_col_imgurl(self):
        return self.imginfocf + ":" + IMG_URLCNAME

    def get_col_imgurlbak(self):
        return self.imginfocf + ":" + IMG_URLBACKUPCNAME

    def get_col_imgpath(self):
        return self.imginfocf + ":" + IMG_PATHCNAME

    def get_col_imgbuff(self):
        return self.imginfocf + ":" + IMG_BUFFCNAME

    def get_col_listsha1s(self):
        return self.updateinfocf + ":" + UPDATE_LISTSHA1CNAME

    # ------------------------------------------------------------- writing

    def push_dict_rows(self, dict_rows, table_name, families=None):
        """Batch write rows {row_key: {column: value}}; oversized rows drop
        the image buffer column first (reference: lines 621-680)."""
        del families
        conn = self._conn()
        with self._lock:
            cur = conn.cursor()
            for row_key, cols in dict_rows.items():
                row_size = sum(len(str(v)) for v in cols.values())
                cols_out = dict(cols)
                if row_size > MAX_ROW_SIZE and self.get_col_imgbuff() in cols_out:
                    del cols_out[self.get_col_imgbuff()]
                for col, val in cols_out.items():
                    if isinstance(val, str):
                        val = val.encode()
                    elif not isinstance(val, (bytes, bytearray)):
                        val = str(val).encode()
                    cur.execute(
                        "INSERT OR REPLACE INTO kv (tbl, row, col, val)"
                        " VALUES (?, ?, ?, ?)",
                        (table_name, row_key, col, val))
            conn.commit()
        return True

    def delete_row(self, table_name, row_key):
        conn = self._conn()
        with self._lock:
            conn.execute("DELETE FROM kv WHERE tbl=? AND row=?",
                         (table_name, row_key))
            conn.commit()

    # ------------------------------------------------------------- reading

    def _group(self, fetched):
        rows = []
        cur_key, cur_cols = None, None
        for row, col, val in fetched:
            if row != cur_key:
                if cur_key is not None:
                    rows.append((cur_key, cur_cols))
                cur_key, cur_cols = row, {}
            cur_cols[col] = val
        if cur_key is not None:
            rows.append((cur_key, cur_cols))
        return rows

    def scan_from_row(self, table_name, row_start=None, row_stop=None,
                      columns=None, maxrows=10):
        """Ordered scan (reference: lines 331-368); returns
        [(row_key, {col: val})]."""
        conn = self._conn()
        # Keyset pagination in two index-ordered queries: (1) the page's
        # distinct row keys (early-exit on LIMIT via the (tbl,row) index),
        # (2) their columns by IN-list. The previous correlated-IN single
        # query re-evaluated the subquery per candidate row (~170 ms/page
        # at 300k updates; this shape measures ~2.5 ms/page).
        cond = "tbl=?"
        args = [table_name]
        if row_start is not None:
            cond += " AND row>=?"
            args.append(row_start)
        if row_stop is not None:
            cond += " AND row<?"
            args.append(row_stop)
        with self._lock:
            keys = [r[0] for r in conn.execute(
                f"SELECT DISTINCT row FROM kv WHERE {cond} ORDER BY row"
                " LIMIT ?", args + [maxrows if maxrows else -1]).fetchall()]
            if not keys:
                return []
            marks = ",".join("?" * len(keys))
            fetched = conn.execute(
                f"SELECT row, col, val FROM kv WHERE tbl=? AND row IN"
                f" ({marks}) ORDER BY row, col",
                [table_name] + keys).fetchall()
        rows = self._group(fetched)
        if columns:
            prefixes = tuple(columns)
            rows = [(r, {c: v for c, v in cols.items()
                         if c.startswith(prefixes)}) for r, cols in rows]
        return rows

    def get_rows_by_batch(self, list_queries, table_name, rbs=READ_BATCH_SIZE,
                          columns=None):
        """Batched point gets (reference: lines 682-741)."""
        conn = self._conn()
        out = []
        for i in range(0, len(list_queries), rbs):
            batch = list(list_queries[i:i + rbs])
            marks = ",".join("?" * len(batch))
            with self._lock:
                fetched = conn.execute(
                    f"SELECT row, col, val FROM kv WHERE tbl=? AND row IN"
                    f" ({marks}) ORDER BY row, col",
                    [table_name] + batch).fetchall()
            rows = self._group(fetched)
            if columns:
                prefixes = tuple(columns)
                rows = [(r, {c: v for c, v in cols.items()
                             if c.startswith(prefixes)}) for r, cols in rows]
            out.extend(rows)
        return out

    def get_columns_from_sha1_rows(self, list_sha1s, columns, rbs=READ_BATCH_SIZE):
        """(reference: lines 743-777)"""
        if not list_sha1s:
            return []
        return self.get_rows_by_batch(list_sha1s, self.table_sha1infos_name,
                                      rbs=rbs, columns=columns)

    # ------------------------------------------------------------- updates

    def get_today_string(self):
        return datetime.date.today().strftime("%Y-%m-%d")

    def get_next_update_id(self, today=None, extr_type=""):
        """(reference: lines 595-617)

        Unlike the reference's pure in-memory counter (which resets to 0 on
        restart and relies solely on the checker's pid+time suffix for
        uniqueness), the first call of the day seeds the counter from the
        max sequence already present in the updates table, so a restarted
        checker on the same day continues numbering instead of reusing ids.
        """
        if today is None:
            today = self.get_today_string()
        key = (today, extr_type)
        if key not in self.dict_up:
            self.dict_up[key] = self._max_existing_seq(today, extr_type) + 1
        else:
            self.dict_up[key] += 1
        update_id = (UPDATE_PREFIX + extr_type + "_" + today + "_"
                     + str(self.dict_up[key]).zfill(3))
        return update_id, today

    def _max_existing_seq(self, today, extr_type):
        """Max update sequence persisted for (extr_type, today), or -1."""
        prefix = UPDATE_PREFIX + extr_type + "_" + today + "_"
        with self._lock:
            fetched = self._conn().execute(
                "SELECT DISTINCT row FROM kv WHERE tbl=? AND row>=? AND row<?",
                (self.table_updateinfos_name, prefix, prefix + "~")
            ).fetchall()
        best = -1
        for (row,) in fetched:
            # row = index_update_<extr>_<date>_<seq>[-<pp>-<time>]
            seq_str = row[len(prefix):].split("-")[0]
            try:
                best = max(best, int(seq_str))
            except ValueError:
                continue
        return best

    def _scan_updates(self, start_date, extr_type, maxrows):
        row_start = UPDATE_PREFIX + extr_type + "_" + start_date
        while True:
            rows = self.scan_from_row(self.table_updateinfos_name,
                                      row_start=row_start, maxrows=maxrows)
            if not rows:
                return
            if extr_type:
                out = [(r, c) for r, c in rows if extr_type in r]
            else:
                out = rows
            if out:
                yield out
            row_start = rows[-1][0] + "~"

    def get_updates_from_date(self, start_date, extr_type="", maxrows=MAX_ROWS):
        """Generator of update-row batches from a date
        (reference: lines 370-421)."""
        yield from self._scan_updates(start_date, extr_type, maxrows)

    def get_unprocessed_updates_from_date(self, start_date, extr_type="",
                                          maxrows=MAX_ROWS):
        """Updates lacking the 'processed' marker (reference: lines 423-491)."""
        col_upproc = self.get_col_upproc()
        for batch in self._scan_updates(start_date, extr_type, maxrows):
            out = [(r, c) for r, c in batch if col_upproc not in c]
            if out:
                yield out

    def get_missing_extr_updates_from_date(self, start_date, extr_type="",
                                           maxrows=MAX_ROWS):
        """Updates whose images miss the extraction
        (reference: lines 493-584). The processed-check is batched per
        scan page — one read covers every update in the page instead of a
        round trip per update."""
        col_list = self.get_col_listsha1s()
        for batch in self._scan_updates(start_date, extr_type, maxrows):
            page = []
            all_sha1s = []
            for row, cols in batch:
                if col_list not in cols:
                    continue
                sha1s = cols[col_list].decode().split(",")
                page.append((row, sha1s))
                all_sha1s.extend(sha1s)
            if not page:
                continue
            missing_set = set(self.get_missing_extr_sha1s(
                list(dict.fromkeys(all_sha1s)), extr_type))
            for row, sha1s in page:
                missing = [s for s in sha1s if s in missing_set]
                if missing:
                    yield [(row, {col_list: ",".join(missing)})]

    # ------------------------------------------------------------ features

    def get_features_from_sha1s(self, list_sha1s, extr_type,
                                feat_type_decode=None):
        """Decode stored features of ``extr_type`` for images
        (reference: lines 779-831). Sample ids: sha1 for full-image, else
        sha1_left_top_right_bottom."""
        has_detection = "_".join(extr_type.split("_")[-2:]) != "full_image"
        if feat_type_decode is None:
            feat_type_decode = extr_type.split("_")[0]
        rows = self.get_columns_from_sha1_rows(list_sha1s,
                                               columns=[self.extrcf])
        samples_id, feats = [], []
        prefix = self.extrcf + ":" + extr_type
        for row_key, cols in rows:
            for key, val in cols.items():
                notinfo = (not key.endswith("_updateid")
                           and not key.endswith(EXTR_STR_PROCESSED)
                           and not key.endswith(EXTR_STR_FAILED))
                if key.startswith(prefix) and notinfo:
                    if has_detection:
                        sid = row_key + "_" + "_".join(key.split("_")[4:8])
                    else:
                        sid = row_key
                    try:
                        feat = featB64decode(val, feat_type_decode)
                    except Exception:
                        continue
                    samples_id.append(sid)
                    feats.append(feat)
        return samples_id, feats

    def get_missing_extr_sha1s(self, list_sha1s, extr_type, skip_failed=False):
        """(reference: lines 833-852)"""
        rows = self.get_columns_from_sha1_rows(list_sha1s,
                                               columns=[self.extrcf])
        done = set()
        prefix = self.extrcf + ":" + extr_type
        for row_key, cols in rows:
            for key, val in cols.items():
                kfailed = (skip_failed and key.endswith(EXTR_STR_FAILED)
                           and val == b"1")
                if key.startswith(prefix) and (
                        key.endswith(EXTR_STR_PROCESSED) or kfailed):
                    done.add(row_key)
        return [s for s in list_sha1s if s not in done]
