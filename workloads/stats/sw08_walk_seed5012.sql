-- generated: QueryGenerator.statsWalkQuery(seed = 5012,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, documents d3, embeddings v1, embeddings v2, embeddings v3 WHERE d2.lang = d1.lang AND d3.lang = d2.lang AND v1.vec_id = d3.doc_id AND v2.vec_id = d1.doc_id AND v3.vec_id = d1.doc_id AND d1.n_chars > 450 AND d2.source = 'src17' AND v1.label < 5 AND v2.label < 2 AND d3.n_chars < 150
