SELECT d.lang, count(*) AS n, max(d.n_chars) AS longest
FROM documents d, embeddings v
WHERE d.doc_id = v.vec_id
  AND d.lang = 'en' AND d.n_chars BETWEEN 100 AND 400
  AND v.label < 4
GROUP BY d.lang ORDER BY d.lang
