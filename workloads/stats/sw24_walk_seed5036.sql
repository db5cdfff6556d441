-- generated: QueryGenerator.statsWalkQuery(seed = 5036,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM documents d1, documents d2, embeddings v1, embeddings v2, embeddings v3, documents d3 WHERE d2.lang = d1.lang AND v1.vec_id = d2.doc_id AND v2.vec_id = d2.doc_id AND v3.label = v2.label AND d3.lang = d2.lang AND v1.label > 5 AND v2.label > 5 AND d2.n_chars > 450 AND d3.lang = 'de'
