" ik_llama.vim — editor integration for the ik_llama_cpp_tpu server
" (the llama.vim / llm.vim analogue).
"
" Install: copy or symlink into ~/.vim/autoload/ as ik_llama.vim, then map:
"   nnoremap Z  :call ik_llama#Generate()<CR>
"   inoremap <C-F> <Cmd>call ik_llama#Infill()<CR>
"
" Configuration (vimrc, window, buffer, or in-file scope):
"   let g:ik_llama_url = "127.0.0.1:8080"
"   let g:ik_llama_api_key = ""
"   let g:ik_llama_overrides = {"temperature": 0.7, "n_predict": 128}
" Buffer/window overrides merge on top: b:ik_llama_overrides etc.
" A first line beginning with `!*` holds a JSON dict of per-file overrides,
" e.g.  !*{"stop": ["User:"], "temperature": 0.2}

if !exists("g:ik_llama_url")
  let g:ik_llama_url = "127.0.0.1:8080"
endif
if !exists("g:ik_llama_overrides")
  let g:ik_llama_overrides = {}
endif

function! s:Params() abort
  let l:params = {"n_predict": 128, "temperature": 0.8, "stream": v:false}
  call extend(l:params, g:ik_llama_overrides)
  if exists("w:ik_llama_overrides")
    call extend(l:params, w:ik_llama_overrides)
  endif
  if exists("b:ik_llama_overrides")
    call extend(l:params, b:ik_llama_overrides)
  endif
  let l:first = getline(1)
  if l:first =~# '^!\*'
    try
      call extend(l:params, json_decode(strpart(l:first, 2)))
    catch
    endtry
  endif
  return l:params
endfunction

function! s:Post(path, body) abort
  let l:cmd = ["curl", "-s", "-X", "POST",
        \ "http://" . g:ik_llama_url . a:path,
        \ "-H", "Content-Type: application/json"]
  if exists("g:ik_llama_api_key") && len(g:ik_llama_api_key)
    let l:cmd += ["-H", "Authorization: Bearer " . g:ik_llama_api_key]
  endif
  let l:cmd += ["-d", json_encode(a:body)]
  let l:out = system(join(map(l:cmd, 'shellescape(v:val)'), " "))
  try
    return json_decode(l:out)
  catch
    echoerr "ik_llama: bad response: " . l:out
    return {}
  endtry
endfunction

" Generate a continuation of everything up to (and including) the cursor
" line and append it to the buffer.
function! ik_llama#Generate() abort
  let l:params = s:Params()
  let l:params["prompt"] = join(getline(1, line(".")), "\n")
  echo "ik_llama: generating..."
  let l:resp = s:Post("/completion", l:params)
  if !has_key(l:resp, "content")
    return
  endif
  let l:lines = split(l:resp["content"], "\n", 1)
  call setline(line("."), getline(".") . l:lines[0])
  if len(l:lines) > 1
    call append(line("."), l:lines[1:])
  endif
  echo "ik_llama: done"
endfunction

" Fill-in-the-middle at the cursor: text before the cursor is the prefix,
" text after it is the suffix (server /infill endpoint, FIM tokens).
function! ik_llama#Infill() abort
  let l:params = s:Params()
  let l:row = line(".")
  let l:col = col(".")
  let l:before = getline(1, l:row - 1)
        \ + [strpart(getline(l:row), 0, l:col - 1)]
  let l:after = [strpart(getline(l:row), l:col - 1)]
        \ + getline(l:row + 1, line("$"))
  let l:params["input_prefix"] = join(l:before, "\n")
  let l:params["input_suffix"] = join(l:after, "\n")
  let l:resp = s:Post("/infill", l:params)
  if !has_key(l:resp, "content")
    return
  endif
  let l:ins = split(l:resp["content"], "\n", 1)
  let l:cur = getline(l:row)
  let l:head = strpart(l:cur, 0, l:col - 1)
  let l:tail = strpart(l:cur, l:col - 1)
  if len(l:ins) == 1
    call setline(l:row, l:head . l:ins[0] . l:tail)
  else
    call setline(l:row, l:head . l:ins[0])
    call append(l:row, l:ins[1:-2] + [l:ins[-1] . l:tail])
  endif
endfunction
