-- generated: QueryGenerator.statsWalkQuery(seed = 6236,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, embeddings v1, documents d2, documents d3 WHERE v1.vec_id = d1.doc_id AND d2.doc_id = v1.vec_id AND d3.doc_id = v1.vec_id AND v1.label < 2 AND d3.n_chars > 400
