-- generated: QueryGenerator.statsWalkQuery(seed = 5001,
--   minTables = 3, maxTables = 7, minFilters = 2, maxFilters = 5)
--   over the stats activity/corpus schema; validated non-empty on sf0.01
SELECT count(*) AS n FROM embeddings v1, documents d1, documents d2, embeddings v2, documents d3, embeddings v3 WHERE d1.doc_id = v1.vec_id AND d2.lang = d1.lang AND v2.vec_id = d1.doc_id AND d3.doc_id = v2.vec_id AND v3.label = v2.label AND d2.source = 'src12' AND d1.source <> 'src7' AND d2.lang <> 'en' AND d2.n_chars > 250 AND d3.lang = 'zh'
