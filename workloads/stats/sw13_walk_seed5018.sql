-- generated: QueryGenerator.statsWalkQuery(seed = 5018,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, embeddings v2, embeddings v3, documents d1, documents d2, documents d3 WHERE v2.label = v1.label AND v3.label = v2.label AND d1.doc_id = v3.vec_id AND d2.doc_id = v3.vec_id AND d3.doc_id = v3.vec_id AND d3.n_chars > 500 AND v2.label > 4 AND d1.lang = 'fr'
