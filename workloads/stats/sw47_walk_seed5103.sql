-- generated: QueryGenerator.statsWalkQuery(seed = 5103,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, embeddings v1, embeddings v2, embeddings v3, documents d2, documents d3 WHERE v1.vec_id = d1.doc_id AND v2.label = v1.label AND v3.label = v2.label AND d2.lang = d1.lang AND d3.lang = d1.lang AND d1.lang <> 'de' AND v2.label > 8 AND d3.lang = 'es' AND d2.n_chars > 500
