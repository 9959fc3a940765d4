-- End-to-end training-data curation, SQL only (run with:
--   sbt "runMain graft.Run examples/curation_pipeline.sql")
-- documents.parquet → minhash dedup → exact dedup → Gopher quality gate
-- → benchmark decontamination → token-balanced shards → a WIRE-FORMAT
-- Delta table any Delta reader can open, then OPTIMIZE + VACUUM it.

CREATE TABLE docs WITH (
  connector = 'single_file',
  path = '/root/testdata/sf0.001/documents.parquet',
  format = 'parquet',
  type = 'source'
);

-- the held-out eval set we must not train on
CREATE VIEW evalset AS SELECT doc_id, text FROM docs WHERE doc_id % 20 = 0;
CREATE VIEW trainset AS SELECT * FROM docs WHERE doc_id % 20 <> 0;

-- near-dup collapse (MinHash-LSH bands + connected-components keepers)
CREATE TABLE kept AS PIPELINE dedup_minhash(trainset,
  id => 'doc_id', text => 'text', threshold => '0.7');

-- exact content dedup on the survivors
CREATE TABLE uniq AS PIPELINE dedup_exact(kept, id => 'doc_id', text => 'text');

-- rule-based quality gate (Gopher battery; synthetic corpus carries only
-- one stopword, hence the relaxed floor)
CREATE TABLE gated AS PIPELINE quality_gate(uniq,
  id => 'doc_id', text => 'text', min_words => '10', min_stop_hits => '1');

-- drop training docs that leak eval content (n-gram containment)
CREATE TABLE clean AS PIPELINE decontaminate(gated, eval => 'evalset',
  id => 'doc_id', text => 'text', shingle_size => '2', threshold => '0.2',
  max_doc_freq => '100');

-- ~equal-token output shards
CREATE TABLE shards AS PIPELINE balanced_shards(clean,
  id => 'doc_id', text => 'text', target_tokens => '2000');

-- publish the curated corpus as a real Delta table, shard-partitioned
CREATE TABLE curated (
  doc_id BIGINT,
  text TEXT,
  shard BIGINT
) WITH (
  connector = 'delta',
  path = '/tmp/graft_curated_delta',
  format = 'parquet',
  type = 'sink',
  'partitioning.fields' = '[shard]'
);

INSERT INTO curated
SELECT c.doc_id, c.text, s.shard
FROM clean c JOIN shards s ON c.doc_id = s.doc_id;

-- table maintenance: bin-pack small files, reclaim aged tombstones
OPTIMIZE curated;
VACUUM curated RETAIN 168 HOURS;

-- continuous refresh (r11): the same corpus as an ICEBERG table keyed by
-- doc_id with the ZERO-READ landing path — upsert_enabled makes every
-- later batch commit as one equality-delete file + appends without ever
-- reading the target, so refresh cost stays O(batch) at any corpus size
CREATE TABLE corpus (
  doc_id BIGINT,
  text TEXT,
  shard BIGINT
) WITH (
  connector = 'iceberg',
  path = '/tmp/graft_curated_iceberg',
  format = 'parquet',
  type = 'sink',
  merge_keys = 'doc_id',
  upsert_enabled = 'true',
  auto_optimize_ratio = '0.2'
);

INSERT INTO corpus
SELECT c.doc_id, c.text, s.shard
FROM clean c JOIN shards s ON c.doc_id = s.doc_id;

-- row-level retention on the published table, merge-on-read: the DELETE
-- writes position-delete files instead of rewriting data. The
-- auto-optimize policy (r12) makes the cleanup AUTOMATIC: any
-- merge-on-read commit that pushes deleted/live rows past the ratio
-- runs the bounded dirty-file compaction on the commit path, so a
-- long-running refresh loop never accumulates scan rent — the manual
-- OPTIMIZE below remains for an immediate fold-in.
ALTER TABLE corpus SET TBLPROPERTIES ('write.delete.mode' = 'merge-on-read');
DELETE FROM corpus WHERE shard = 0;
OPTIMIZE corpus;

-- the data card: what survived each stage
SELECT 'input' AS stage, count(*) AS docs FROM docs
UNION ALL SELECT 'train', count(*) FROM trainset
UNION ALL SELECT 'near-dup deduped', count(*) FROM kept
UNION ALL SELECT 'exact deduped', count(*) FROM uniq
UNION ALL SELECT 'quality gated', count(*) FROM gated
UNION ALL SELECT 'decontaminated', count(*) FROM clean;
