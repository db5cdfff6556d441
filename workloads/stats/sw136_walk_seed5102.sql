-- generated: QueryGenerator.statsWalkQuery(seed = 5102,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, embeddings v1, embeddings v2, documents d2, documents d3, embeddings v3 WHERE v1.vec_id = d1.doc_id AND v2.vec_id = d1.doc_id AND d2.doc_id = v2.vec_id AND d3.lang = d2.lang AND v3.vec_id = d1.doc_id AND d1.n_chars > 400 AND v3.label > 2
