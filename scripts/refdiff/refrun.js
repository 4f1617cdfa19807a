'use strict';
// Differential oracle driver: run reference jsonld.js operations on a
// JSON request (or array of requests) from stdin; print one JSON line
// per request: {"result": ...} or {"errorCode": ...}.
//
// Request: {op, input, context, frame, options, contexts}
//   op: expand|compact|flatten|frame|toRDF|fromRDF
//   contexts: {url: document} snapshot backing the documentLoader
//
// The reference is loaded from /root/reference (read-only); the three
// missing npm deps are satisfied by the minimal shims in ./node_modules
// (lru-cache map stand-in, rdf-canonize IdentifierIssuer + N-Quads,
// JCS canonicalize) — all original code, no network.
let jsonld = require('/root/reference/lib/index.js');

// jsonld.js holds MODULE-LEVEL caches (resolved-context LRU keyed by
// URL, processed-context tags) that leak across requests in one
// process: two cases importing the SAME context URL contaminate each
// other's @import/@protected processing. For requests that carry a
// context snapshot, reload the reference to get pristine caches.
function freshJsonld() {
  for (const k of Object.keys(require.cache)) {
    if (k.startsWith('/root/reference/')) delete require.cache[k];
  }
  jsonld = require('/root/reference/lib/index.js');
  return jsonld;
}

// Replace any value that is its own ancestor (a @link cycle) with a
// marker carrying the node's raw '@id' (true when absent). Shared
// non-ancestor references serialize fully at each site — identical on
// both engines given parity — so only genuine cycles are cut, and the
// cut condition is structural (order-independent).
function decycle(v, path) {
  if (Array.isArray(v)) {
    if (path.has(v)) return {'__cycle__': true};
    path.add(v);
    const out = v.map(x => decycle(x, path));
    path.delete(v);
    return out;
  }
  if (v && typeof v === 'object') {
    if (path.has(v)) {
      return {'__cycle__': v['@id'] === undefined ? true : v['@id']};
    }
    path.add(v);
    const out = {};
    for (const k of Object.keys(v)) out[k] = decycle(v[k], path);
    path.delete(v);
    return out;
  }
  return v;
}

async function run(req) {
  const options = Object.assign({}, req.options || {});
  const snapshot = req.contexts || {};
  if (req.contexts) freshJsonld();
  options.documentLoader = async url => {
    if (url in snapshot) {
      const v = snapshot[url];
      if (v && typeof v === 'object' && 'document' in v &&
          'documentUrl' in v) {
        // RemoteDocument-shaped snapshot entry: carries a
        // Link-header-discovered contextUrl and/or a redirected
        // documentUrl (ContextResolver.js:202-207 appends contextUrl
        // to the fetched @context for resolution in turn)
        return {contextUrl: v.contextUrl || null,
                documentUrl: v.documentUrl || url,
                document: v.document};
      }
      return {contextUrl: null, documentUrl: url, document: v};
    }
    throw new jsonld.JsonLdError(
      'URL could not be dereferenced: ' + url,
      'jsonld.LoadDocumentError', {code: 'loading document failed'});
  };
  try {
    let result;
    switch (req.op) {
      case 'expand': result = await jsonld.expand(req.input, options); break;
      case 'compact':
        result = await jsonld.compact(req.input, req.context, options); break;
      case 'flatten':
        result = await jsonld.flatten(req.input, req.context !== undefined ? req.context : null, options);
        break;
      case 'frame':
        // a per-subframe @embed:@link makes the framed output a
        // shared/cyclic in-memory structure -- cut cycles like link
        result = decycle(
          await jsonld.frame(req.input, req.frame, options), new Set());
        break;
      case 'toRDF': {
        options.format = 'application/n-quads';
        result = await jsonld.toRDF(req.input, options); break;
      }
      case 'fromRDF': {
        const NQuads = require('rdf-canonize').NQuads;
        result = await jsonld.fromRDF(NQuads.parse(req.input), options);
        break;
      }
      case 'nodeMap':
        result = await jsonld.createNodeMap(req.input, options);
        break;
      case 'canonize':
        // jsonld.js:564-604 — toRDF (or N-Quads parse under
        // inputFormat) then rdf-canonize; the shim's canonize() is a
        // fresh spec-derived RDFC-1.0 implementation, so this leg is a
        // cross-implementation differential on canonical labeling
        result = await jsonld.canonize(req.input, options);
        break;
      case 'merge':
        // input is an ARRAY of documents (jsonld.js:770-857)
        result = await jsonld.merge(
          req.input, req.context !== undefined ? req.context : null,
          options);
        break;
      case 'link':
        // jsonld.js:513-522: frame with a wildcard frame + @embed:@link.
        // Output holds SHARED/CYCLIC in-memory structures; cut cycles
        // (ancestor-revisit) with a structural marker before stringify.
        result = decycle(await jsonld.link(
          req.input, req.context !== undefined ? req.context : null,
          options), new Set());
        break;
      default: throw new Error('unknown op ' + req.op);
    }
    return {result};
  } catch (e) {
    let code = null;
    let cur = e;
    while (cur) {
      if (cur.details && cur.details.code) { code = cur.details.code; break; }
      // safe-mode validation errors carry the event code
      if (cur.details && cur.details.event && cur.details.event.code) {
        code = cur.details.event.code; break;
      }
      cur = cur.details && cur.details.cause;
    }
    // code-less JsonLdErrors (e.g. frame.js:447-450 'must be a single
    // object') fall back to the jsonld.* type name so strict code
    // comparison can still match; raw crashes keep their message
    if(!code && String(e.name).startsWith('jsonld.')) code = e.name;
    return {errorCode: code || String(e.message)};
  }
}

let chunks = [];
process.stdin.on('data', c => chunks.push(c));
process.stdin.on('end', async () => {
  const parsed = JSON.parse(Buffer.concat(chunks).toString('utf8'));
  const reqs = Array.isArray(parsed) ? parsed : [parsed];
  // jsonld.js's shared inline-context LRU pins base-dependent
  // context-processing results (@vocab: "", relative @base chains) to
  // the FIRST request that processed a given context. A request that
  // changes the effective base mid-batch (compactToRelative: false
  // deletes options.base) must run against PRISTINE caches — and so
  // must the request AFTER it, which would otherwise read the
  // base-less entries it wrote.
  let needFresh = false;
  for (const req of reqs) {
    if (req.fresh || needFresh) freshJsonld();
    needFresh = !!req.fresh;
    process.stdout.write(JSON.stringify(await run(req)) + '\n');
  }
});
