-- generated: QueryGenerator.statsWalkQuery(seed = 5065,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, documents d1, embeddings v2, embeddings v3, documents d2, documents d3 WHERE d1.doc_id = v1.vec_id AND v2.label = v1.label AND v3.label = v1.label AND d2.doc_id = v1.vec_id AND d3.lang = d1.lang AND d3.source = 'src6' AND d3.n_chars < 300 AND v3.label > 0 AND d3.lang = 'en' AND d1.source = 'src19'
